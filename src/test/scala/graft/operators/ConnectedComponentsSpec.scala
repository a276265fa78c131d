package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
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

  test("labels equal union-find on a random graph (incl. chains and cliques)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // chains force multi-round convergence; random edges add merges
    val chain = (0L until 40L).sliding(2).map(s => (s(0) + 100, s(1) + 100)).toSeq
    val clique = for (a <- 0 to 5; b <- a + 1 to 5) yield (a.toLong, b.toLong)
    val random = Seq.fill(60)((rnd.nextInt(50).toLong + 200, rnd.nextInt(50).toLong + 200))
    val edges = chain ++ clique ++ random
    val got = ConnectedComponents
      .run(spark, edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(300, edges))
  }

  test("superseded checkpoint blocks are freed (only the result persists)") {
    import spark.implicits._
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
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 2L))
    val got = ConnectedComponents.run(spark, edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
