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

  test("clustering coefficient: brute-force parity, clique = 1.0, star = 0.0") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC0EFF)
    val nV = 40
    val edges = (Seq.fill(nV * 3) {
      val a = rnd.nextInt(nV).toLong; val b = rnd.nextInt(nV).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b } ++
      // embed a 4-clique (coeff 1.0 if no external edges attach) and
      // a pendant star tip (coeff 0)
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (101L, 102L),
        (101L, 103L), (102L, 103L), (200L, 201L))).toSet
    val got = GraphOps.clusteringCoeff(edges.toSeq.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val tris = bruteTriangles(edges)
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    got.foreach { case (node, d, nTri, coeff) =>
      assert(d === deg(node), s"node $node degree")
      val expTri = tris.count { case (a, b, c) => a == node || b == node || c == node }
      assert(nTri === expTri.toLong, s"node $node triangle count")
      val exp = if (d < 2) 0.0
        else BigDecimal(2.0 * expTri / (d * (d - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(coeff === exp, s"node $node coeff")
    }
    val byNode = got.map(r => r._1 -> r._4).toMap
    Seq(100L, 101L, 102L, 103L).foreach(v => assert(byNode(v) === 1.0, s"clique node $v"))
    assert(byNode(200L) === 0.0 && byNode(201L) === 0.0)
  }

  test("triangle-free graphs: star and bipartite yield empty output") {
    val star = (1L to 20L).map(l => (0L, l)).toSet
    assert(run(star).isEmpty)
    val bip = (for { a <- 0L to 9L; b <- 10L to 19L if (a + b) % 3 == 0 }
      yield (a, b)).toSet
    assert(run(bip).isEmpty)
  }
}
