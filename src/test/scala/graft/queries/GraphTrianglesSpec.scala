package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Degree-oriented triangle listing vs a brute-force reference on
  * random graphs, plus the hub fixture that motivates degree (not id)
  * orientation. */
class GraphTrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bruteTriangles(edges: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val verts = adj.keys.toSeq.sorted
    (for {
      a <- verts
      b <- adj(a).filter(_ > a)
      c <- adj(b).filter(_ > b) if adj(a).contains(c)
    } yield (a, b, c)).toSet
  }

  private def run(edges: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val df = edges.toSeq.toDF("u", "v")
    GraphOps.triangles(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("parity with brute force on random graphs (each triangle listed exactly once)") {
    val rnd = new scala.util.Random(0x7121)
    (0 until 4).foreach { trial =>
      val nV = 30 + trial * 20
      val nE = nV * 3
      val edges = Seq.fill(nE) {
        val a = rnd.nextInt(nV).toLong; val b = rnd.nextInt(nV).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.toSet
      val got = {
        import spark.implicits._
        val df = edges.toSeq.toDF("u", "v")
        GraphOps.triangles(df).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      assert(got.length === got.toSet.size, s"trial $trial: duplicate triangles")
      assert(got.toSet === bruteTriangles(edges), s"trial $trial mismatch")
      assert(got.toSeq === got.toSeq.sorted, s"trial $trial: output not (a,b,c)-sorted")
    }
  }

  test("hub fixture: star + rim — the shape where id-orientation would wedge quadratically") {
    // vertex 0 is a low-ID hub of degree 40 (id-orientation would give
    // it out-degree 40 → 780 wedges); degree-orientation gives the
    // hub out-degree <= 2 since every leaf has lower degree. Leaves
    // 1..40 in a cycle rim so triangles exist only hub-adjacent.
    val leaves = (1L to 40L)
    val spokes = leaves.map(l => (0L, l)).toSet
    val rim = leaves.map(l => { val m = if (l == 40L) 1L else l + 1
      (math.min(l, m), math.max(l, m)) }).toSet
    val edges = spokes ++ rim
    val expected = bruteTriangles(edges)
    assert(expected.size === 40, "each rim edge closes exactly one hub triangle")
    assert(run(edges) === expected)
  }

  test("triangle-free graphs: star and bipartite yield empty output") {
    val star = (1L to 20L).map(l => (0L, l)).toSet
    assert(run(star).isEmpty)
    val bip = (for { a <- 0L to 9L; b <- 10L to 19L if (a + b) % 3 == 0 }
      yield (a, b)).toSet
    assert(run(bip).isEmpty)
  }
}
