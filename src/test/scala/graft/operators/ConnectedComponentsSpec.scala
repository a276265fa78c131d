package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val ThresholdKey = "spark.graft.cc.localEdgeThreshold"

  /** run with the given local-path threshold, restoring the conf. */
  private def runWith(threshold: String, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val prev = spark.conf.getOption(ThresholdKey)
    spark.conf.set(ThresholdKey, threshold)
    try ConnectedComponents.run(spark, edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally prev match {
      case Some(v) => spark.conf.set(ThresholdKey, v)
      case None => spark.conf.unset(ThresholdKey)
    }
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def randomGraph(seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // chains force multi-round convergence; random edges add merges
    val chain = (0L until 40L).sliding(2).map(s => (s(0) + 100, s(1) + 100)).toSeq
    val clique = for (a <- 0 to 5; b <- a + 1 to 5) yield (a.toLong, b.toLong)
    val random = Seq.fill(60)((rnd.nextInt(50).toLong + 200, rnd.nextInt(50).toLong + 200))
    chain ++ clique ++ random
  }

  test("distributed loop labels equal union-find on a random graph") {
    val edges = randomGraph(42)
    assert(runWith("0", edges) === unionFind(edges))
  }

  test("driver fast path labels equal union-find on a random graph") {
    val edges = randomGraph(42)
    assert(runWith(Long.MaxValue.toString, edges) === unionFind(edges))
  }

  test("property: driver fast path == distributed loop on random graphs") {
    (1 to 5).foreach { seed =>
      val edges = randomGraph(seed)
      assert(runWith(Long.MaxValue.toString, edges) === runWith("0", edges),
        s"seed $seed")
    }
  }

  test("superseded checkpoint blocks are freed (only the result persists)") {
    import spark.implicits._
    spark.conf.set(ThresholdKey, "0") // force the iterative loop
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      // a 40-vertex chain needs several pointer-jumping rounds — each
      // round checkpoints a label table; all but the final one (and the
      // edge table) must be unpersisted by the time run() returns
      val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      val labels = ConnectedComponents.run(spark, chain.toDF("a", "b"), "a", "b")
      assert(labels.count() === 40)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 2,
        s"expected only the result checkpoint to remain, found ${leaked.size} persistent RDDs")
      leaked.foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
    } finally spark.conf.unset(ThresholdKey)
  }

  test("self-loops and duplicate edges are harmless on both paths") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 2L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    assert(runWith("0", edges) === want)
    assert(runWith(Long.MaxValue.toString, edges) === want)
  }

  test("non-Long ids keep the type-agnostic distributed loop under the default threshold") {
    import spark.implicits._
    // IntegerType ids: the driver fast path collects (Long, Long), so
    // these must take the loop — and keep their IntegerType labels
    val edges = Seq((1, 2), (2, 3), (10, 11)).toDF("a", "b")
    val out = ConnectedComponents.run(spark, edges, "a", "b")
    assert(out.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.IntegerType))
    val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got === Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("a malformed threshold conf names the key") {
    val e = intercept[IllegalArgumentException] { runWith("1k", Seq((1L, 2L))) }
    assert(e.getMessage.contains(ThresholdKey) && e.getMessage.contains("1k"))
  }

  test("threshold conf above the sanity ceiling is clamped to MaxLocalEdgeThreshold") {
    // the threshold bounds the driver edge chunks AND the LocalRelation
    // result (≤ 2×edges vertex rows) — a runaway conf value must not be
    // honored blindly
    val prev = spark.conf.getOption(ThresholdKey)
    spark.conf.set(ThresholdKey, (ConnectedComponents.MaxLocalEdgeThreshold * 4).toString)
    try assert(ConnectedComponents.localEdgeThreshold(spark) ===
      ConnectedComponents.MaxLocalEdgeThreshold)
    finally prev match {
      case Some(v) => spark.conf.set(ThresholdKey, v)
      case None => spark.conf.unset(ThresholdKey)
    }
  }

  test("forceDistributed bypasses the driver fast path and matches union-find") {
    import spark.implicits._
    val edges = randomGraph(7)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // default threshold (1M) would take the fast path for this tiny graph
    val out = ConnectedComponents.run(spark, edges.toDF("a", "b"), "a", "b",
      forceDistributed = true)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(edges))
    // the loop leaves its result checkpoint persisted; the fast path
    // leaves none — a non-empty delta proves the loop actually ran
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.nonEmpty, "expected the distributed loop's result checkpoint")
    leaked.foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
  }

  test("maxIter exhaustion frees every checkpoint before throwing") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // a 400-vertex chain cannot converge in one round; the failure path
    // must not leak the edge table or any round's label checkpoints
    val chain = (0L until 400L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalArgumentException] {
      ConnectedComponents.run(spark, chain.toDF("a", "b"), "a", "b",
        maxIter = 1, forceDistributed = true)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked checkpoint RDD ids: $leaked")
  }

  test("error-path cleanup never evicts a caller-cached input (lineage-scoped ids)") {
    import spark.implicits._
    // the caller's cached edge table sits in every checkpoint's lineage;
    // checkpoint-id capture must scope to blocks persisted DURING run()
    // (ADVICE r7: keyset deltas could grab a concurrent job's blocks;
    // the lineage fix must not overcorrect into freeing caller caches)
    val chain = (0L until 400L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cached = chain.toDF("a", "b").persist()
    try {
      assert(cached.count() === 399)
      intercept[IllegalArgumentException] {
        ConnectedComponents.run(spark, cached, "a", "b",
          maxIter = 1, forceDistributed = true)
      }
      assert(cached.storageLevel.useMemory,
        "run()'s error-path free() evicted the caller's cached input")
      assert(cached.count() === 399)
    } finally cached.unpersist(blocking = true)
  }
}
