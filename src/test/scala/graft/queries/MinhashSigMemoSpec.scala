package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the MinHash signature-table memo lifecycle (ADVICE r21): the
  * (doc_id, sig8, bhs) checkpoint memoizes per (session, dir),
  * survives the pinned-aware sweep, rebuilds on evictMinhashSigs and
  * on external block loss, and the near-dup pair set never drifts. */
class MinhashSigMemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sig memo: build, sweep-survive, evict-rebuild, stale-rebuild") {
    val q = graft.SparkEntry.queries("dedup_minhash_lsh")
    // warm sibling state first, then reset THIS memo so the block-id
    // accounting below sees only the signature checkpoint
    q(spark, sf).collect()
    TextOps.evictMinhashSigs(spark, sf)
    graft.operators.Checkpoints.unpersistUnpinned(spark)
    try {
      val preIds = spark.sparkContext.getPersistentRDDs.keySet
      val r1 = q(spark, sf).collect().toSeq
      val memoIds = spark.sparkContext.getPersistentRDDs.keySet -- preIds
      assert(memoIds.nonEmpty, "first call must pin the signature checkpoint")
      assert(memoIds.forall(graft.operators.Checkpoints.isPinned(spark.sparkContext, _)),
        "signature checkpoint blocks must be pinned against sweeps")

      assert(q(spark, sf).collect().toSeq === r1)
      assert((spark.sparkContext.getPersistentRDDs.keySet -- preIds) === memoIds,
        "second call rebuilt the signature memo")

      graft.operators.Checkpoints.unpersistUnpinned(spark)
      assert(q(spark, sf).collect().toSeq === r1, "post-sweep pairs drifted")

      TextOps.evictMinhashSigs(spark, sf)
      assert((spark.sparkContext.getPersistentRDDs.keySet intersect memoIds).isEmpty,
        "evict must release the pinned blocks")
      assert(q(spark, sf).collect().toSeq === r1, "post-evict pairs drifted")

      // external block loss → stale probe must rebuild, not fail
      val rebuiltIds = spark.sparkContext.getPersistentRDDs.keySet -- preIds
      rebuiltIds.foreach(id =>
        spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
      assert(q(spark, sf).collect().toSeq === r1, "post-block-loss pairs drifted")
    } finally TextOps.evictMinhashSigs(spark, sf)
  }
}
