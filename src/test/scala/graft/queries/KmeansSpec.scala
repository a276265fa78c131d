package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the deterministic Lloyd kernel: convergence on a separable
  * fixture, the duplicate-seed → empty-cluster drop (both engines'
  * documented shrinkage semantics), and SemDeDup's keep/drop verdicts. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Two tight blobs around +e0 and +e1 (scaled), plus duplicate seed
    * vectors 0/1 — seeds 0..3 with vec 2 == vec 0 exactly, so cluster
    * 2 must end empty (members tie-break to the lower cid 0). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("kmeans").toString
    import spark.implicits._
    def vec(hot: Int, mag: Float, jitter: Float): Array[Float] = {
      val a = new Array[Float](64)
      a(hot) = mag
      a(63) = jitter
      a
    }
    val rows =
      // seeds: 0 in blob A, 1 in blob B, 2 == 0 (duplicate), 3 in B
      Seq((0L, vec(0, 10f, 0f)), (1L, vec(1, 10f, 0f)),
        (2L, vec(0, 10f, 0f)), (3L, vec(1, 10f, 0.5f))) ++
      // blob A members
      (4L to 9L).map(i => (i, vec(0, 10f, (i % 3) * 0.1f))) ++
      // blob B members
      (10L to 15L).map(i => (i, vec(1, 10f, (i % 3) * 0.1f)))
    rows.toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("separable blobs converge; duplicate seed's cluster is dropped") {
    val out = VectorOps.kmeansAssign(spark, dir, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 16)
    val byId = out.map(r => r._1 -> r._2).toMap
    // nothing may be assigned to the duplicate seed's cluster 2: at
    // every assignment its distance ties seed 0 and the lower cid wins
    assert(!byId.values.exists(_ === 2L), s"cluster 2 not empty: $byId")
    // blob A (hot dim 0) all in cluster 0; blob B in 1 or 3
    val blobA = Seq(0L, 2L, 4L, 5L, 6L, 7L, 8L, 9L)
    assert(blobA.forall(byId(_) === 0L), s"blob A split: $byId")
    // seed 3 (jitter 0.5) stays its own cluster (distance 0 to its own
    // centroid every round); the rest of blob B converges to cluster 1
    assert(byId(3L) === 3L, s"seed 3 strayed: $byId")
    assert((Seq(1L) ++ (10L to 15L)).forall(byId(_) === 1L),
      s"blob B did not converge: $byId")
    // the duplicate of vec 0 sits at distance 0 from centroid 0 only if
    // cluster 0 collapsed onto the exact blob-A mean — just require the
    // distances to be small and exact-deterministic across two runs
    val out2 = VectorOps.kmeansAssign(spark, dir, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
  }

  test("semdedup drops exact duplicates, keeps the lowest id") {
    val out = VectorOps.semdedup(spark, dir, 4, 3, 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val kept = out.filter(_._2).map(_._1).toSet
    // 2 duplicates 0 exactly (cos 1.0) -> dropped; 0 kept
    assert(kept.contains(0L) && !kept.contains(2L))
    // every vector appears exactly once in the verdict table
    assert(out.length === 16)
  }
}
