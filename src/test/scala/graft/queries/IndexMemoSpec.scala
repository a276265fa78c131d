package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the session-scoped index-table memo lifecycle (ADVICE r21 /
  * VERDICT r21 task 1 "spec mirroring GraphEdgeMemoSpec"): the
  * assigned inverted-list checkpoint memoizes, survives the pinned-
  * aware sweep, rebuilds on evict and on external block loss
  * (staleness), and the consuming query results never drift. */
class IndexMemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("index memo: build, sweep-survive, evict-rebuild, stale-rebuild") {
    val q = graft.SparkEntry.queries("vec_ann_ivf_trained")
    // warm the sibling memo tiers (coarse quantizer, shared stages)
    // first, then reset THIS memo — so the block-id accounting below
    // sees only the index-table checkpoint
    q(spark, sf).collect()
    VectorOps.evictIndexTables(spark, sf)
    graft.operators.Checkpoints.unpersistUnpinned(spark)
    try {
      val preIds = spark.sparkContext.getPersistentRDDs.keySet
      val r1 = q(spark, sf).collect().toSeq
      val memoIds = spark.sparkContext.getPersistentRDDs.keySet -- preIds
      assert(memoIds.nonEmpty, "first call must pin the memo checkpoint")
      assert(memoIds.forall(graft.operators.Checkpoints.isPinned(spark.sparkContext, _)),
        "memo checkpoint blocks must be pinned against sweeps")

      // a second call serves the SAME pinned entry (no new blocks)
      assert(q(spark, sf).collect().toSeq === r1)
      assert((spark.sparkContext.getPersistentRDDs.keySet -- preIds) === memoIds,
        "second call rebuilt the memo")

      // the Bench-style pinned-aware sweep must NOT invalidate it
      graft.operators.Checkpoints.unpersistUnpinned(spark)
      assert(q(spark, sf).collect().toSeq === r1, "post-sweep results drifted")
      assert((spark.sparkContext.getPersistentRDDs.keySet -- preIds) === memoIds,
        "sweep forced a memo rebuild")

      // EVICT → blocks released, next call rebuilds deterministically
      VectorOps.evictIndexTables(spark, sf)
      assert((spark.sparkContext.getPersistentRDDs.keySet intersect memoIds).isEmpty,
        "evict must release the pinned blocks")
      assert(q(spark, sf).collect().toSeq === r1, "post-evict results drifted")

      // STALENESS: raw external unpersist of the backing RDDs (block
      // loss) — the next access must detect and rebuild, not die on a
      // missing block
      val rebuiltIds = spark.sparkContext.getPersistentRDDs.keySet -- preIds
      rebuiltIds.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
      assert(q(spark, sf).collect().toSeq === r1, "post-block-loss results drifted")
    } finally VectorOps.evictIndexTables(spark, sf)
  }
}
