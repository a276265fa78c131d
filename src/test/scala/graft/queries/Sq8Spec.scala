package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Scalar-quantization invariants the oracle gate can't see: the code
  * range (1-byte storability — the 8× compression claim), the
  * reconstruction-error bound of the per-dimension grid, and the
  * recall contract vs the full-precision truth. */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("codes are 1-byte: every code in [0, 255], extremes actually used") {
    val rows = VectorOps.sq8Table(spark, sf).collect()
    val codes = rows.flatMap(_.getSeq[Int](2))
    assert(codes.forall(c => c >= 0 && c <= 255))
    // per-dim min/max map to the grid ends, so both extremes appear
    assert(codes.contains(0) && codes.contains(255),
      "grid ends unused — min/max scaling is off")
  }

  test("reconstruction error is within half a grid step per dimension") {
    val rows = VectorOps.sq8Table(spark, sf).collect()
    val dim = rows.head.getSeq[Double](1).length
    // recompute the per-dim grid from the raw vectors
    val cols = (0 until dim).map { d =>
      val xs = rows.map(_.getSeq[Double](1)(d))
      (xs.min, xs.max)
    }
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val dec = r.getSeq[Double](3)
      (0 until dim).foreach { d =>
        val (mn, mx) = cols(d)
        val halfStep = (mx - mn) / 255.0 / 2.0
        assert(math.abs(dec(d) - v(d)) <= halfStep + 1e-12,
          s"vec ${r.getLong(0)} dim $d: |${dec(d)} - ${v(d)}| > $halfStep")
      }
    }
  }

  test("flat SQ8 scan recall@10 vs brute force is near-exact on the fixture") {
    // sf0.001's 50-vector corpus puts quantization noise right at the
    // rank-10 boundary for one query (0.9); at sf0.01 every query is
    // 1.0 (the oracle gate pins the exact values at every SF)
    val recall = graft.SparkEntry.queries("vec_recall_eval_sq8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(recall.nonEmpty)
    recall.foreach { case (q, r) =>
      assert(r >= 0.9, s"query $q: SQ8 recall $r below the near-exact contract")
    }
    val mean = recall.map(_._2).sum / recall.length
    assert(mean >= 0.95, s"mean SQ8 recall $mean")
  }

  test("IVF-SQ8 recall equals exact-scan trained-IVF recall: probed-list loss is the ONLY loss") {
    // the composed index's claim: at SQ8 precision the quantizer adds
    // nothing on top of the nprobe pruning — per-query recall must
    // MATCH vec_recall_eval_trained (exact scan of the same lists)
    val ivfsq = graft.SparkEntry.queries("vec_recall_eval_ivfsq8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val trained = graft.SparkEntry.queries("vec_recall_eval_trained")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ivfsq.keySet === trained.keySet)
    // EXACT per-query equality (review r14 pass 2: the doc claims
    // equality, so the spec must enforce equality — a legitimate
    // future fixture where SQ8 precision costs a rank-10 hit should
    // fail here loudly and relax this consciously)
    ivfsq.foreach { case (q, r) =>
      assert(r === trained(q),
        s"query $q: IVF-SQ8 $r != exact-probed ${trained(q)} — SQ8 lost rank-10 fidelity")
    }
  }
}
