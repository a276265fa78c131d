package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Adaptive filtered-ANN rule (VERDICT r18 task 3). Fixed-nprobe
  * post-filter search collapses under selective predicates — the
  * probed lists empty out and recall vs the FILTERED truth drops.
  * These tests pin:
  *  1. the pure arithmetic of [[VectorOps.adaptiveNprobe]] — widen
  *     band, fallback band, base/nLists clamps, domain checks;
  *  2. the plan-time dispatch at sf0.001 (17 trained lists, 500
  *     vectors): even-label keeps the base probe, a 25% predicate
  *     WIDENS, a 1% predicate FALLS BACK;
  *  3. the failure mode itself: at a 1% predicate the fixed-nprobe
  *     path misses filtered-truth matches that the adaptive path
  *     (brute-force fallback) returns exactly.
  * The 100k-scale selectivity sweep lives in FilteredAnnProbe
  * (bench/filtered_ann_probe_r{N}.json). */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def requireFixture(): Unit =
    assume(new java.io.File(dir).isDirectory, s"fixture dir $dir absent")

  test("adaptiveNprobe arithmetic: widen, fallback, clamps") {
    import VectorOps.adaptiveNprobe
    // abundant predicate: expected candidates already ≥ safety·k at
    // the base probe → base kept (never shrinks below base)
    assert(adaptiveNprobe(0.5, 300, 316, 4, 10) === Some(4))
    // moderate predicate: widen to ceil(30 / (0.01·316)) = 10
    assert(adaptiveNprobe(0.01, 316, 316, 4, 10) === Some(10))
    // sparse predicate: required p = 95 > 0.3·316 → fallback even
    // though the corpus holds 100 qualifying vectors
    assert(adaptiveNprobe(0.001, 316, 316, 4, 10) === None)
    // corpus too thin overall: selectivity·N < safety·k → fallback
    assert(adaptiveNprobe(0.0001, 316, 316, 4, 10) === None)
    // degenerate empty predicate
    assert(adaptiveNprobe(0.0, 316, 316, 4, 10) === None)
    // p is capped at nLists (tiny index whose base exceeds its lists)
    assert(adaptiveNprobe(1.0, 20, 3, 5, 10) === Some(3))
    // domain checks are loud
    intercept[IllegalArgumentException](adaptiveNprobe(1.5, 10, 10, 4, 10))
    intercept[IllegalArgumentException](adaptiveNprobe(-0.1, 10, 10, 4, 10))
  }

  test("plan-time dispatch at sf0.001: keep / widen / fall back") {
    requireFixture()
    // 500 vectors, 17 trained lists (CentroidStep 31), avgList ≈ 29.4
    val keep = VectorOps.adaptiveDecision(spark, dir, 3, 4, col("label") % 2 === 0)
    assert(keep === Some(4), s"50% predicate must keep the base probe: $keep")
    val widen = VectorOps.adaptiveDecision(spark, dir, 3, 4, col("vec_id") % 4 === 0)
    assert(widen === Some(5), s"25% predicate must widen 4 → 5: $widen")
    val fall = VectorOps.adaptiveDecision(spark, dir, 3, 4, col("vec_id") % 100 === 2)
    assert(fall === None, s"1% predicate must fall back to brute force: $fall")
  }

  test("gate-row predicates take their documented branches (round 20 oracle rows)") {
    requireFixture()
    // vec_ann_adaptive: ~22% (vec_id % 9 < 2) must WIDEN 4 → 5 — the
    // Some(p) branch with p > base, so the gate row genuinely
    // exercises the widening (not just base-kept) path
    val moderate = VectorOps.adaptiveDecision(spark, dir, 3, 4,
      col("vec_id") % 9 < 2)
    assert(moderate === Some(5), s"moderate gate predicate must widen to 5: $moderate")
    // vec_ann_adaptive_sparse: 4% (vec_id % 25 = 24) keeps only 20 of
    // 500 vectors — under safety·k = 30, no probe width can fill k →
    // the None (filtered brute force) branch
    val sparse = VectorOps.adaptiveDecision(spark, dir, 3, 4,
      col("vec_id") % 25 === 24)
    assert(sparse === None, s"sparse gate predicate must fall back: $sparse")
    // and the sparse gate row's output IS the filtered truth (recall
    // 1.0 by construction — the property the oracle also checks)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("match_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sparsePred = col("vec_id") % 25 === 24
    assert(pairs(VectorOps.queries("vec_ann_adaptive_sparse")(spark, dir)) ===
      pairs(VectorOps.bruteforceFilteredWith(spark, dir, sparsePred)))
  }

  test("adaptive == fixed on the abundant predicate; exact on the sparse one") {
    requireFixture()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("query_id"), col("match_id"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // abundant: the decision keeps base nprobe, so the adaptive result
    // IS the fixed gate-row result
    val fixedEven = VectorOps.queries("vec_ann_ivf_filtered")(spark, dir)
    val adaptEven = VectorOps.annIvfFilteredAdaptive(spark, dir)
    assert(rows(adaptEven) === rows(fixedEven))
    // sparse: adaptive falls back → exactly the filtered truth
    val pred = col("vec_id") % 100 === 2
    val truth = rows(VectorOps.bruteforceFilteredWith(spark, dir, pred))
    val adapt = rows(VectorOps.annIvfFilteredAdaptive(spark, dir, pred = pred))
    assert(adapt === truth)
    assert(truth.nonEmpty)
    // and the fixed-nprobe path DEMONSTRABLY misses truth matches
    // here — the collapse the rule exists to prevent
    val fixedSparse = rows(VectorOps.annIvfFilteredWith(spark, dir, 3, 4, pred))
      .map { case (q, m, _) => (q, m) }
    val truthPairs = truth.map { case (q, m, _) => (q, m) }
    assert((truthPairs -- fixedSparse).nonEmpty,
      "expected the fixed-nprobe path to miss filtered-truth matches " +
        s"at 1% selectivity; fixed=${fixedSparse.size} truth=${truthPairs.size}")
  }
}
