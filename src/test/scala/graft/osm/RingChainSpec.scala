package graft.osm

import org.scalatest.funsuite.AnyFunSuite
import GeometryBuilder.Member

/** Property tests for greedy ring chaining (G6) — FIXTURES.md §A /
  * SURVEY §5.4 invariants: every emitted ring is closed, node count is
  * preserved modulo junction dedup and closure, and chaining is
  * insensitive to member order and orientation. */
class RingChainSpec extends AnyFunSuite {

  private def mk(role: String, ids: Seq[Long]): Member =
    Member(role, ids.toArray, ids.map(_.toDouble * 2).toArray,
      ids.map(_.toDouble * 3).toArray)

  /** Split a closed ring of node ids into consecutive open ways. */
  private def split(ring: Seq[Long], cuts: Seq[Int]): Seq[Seq[Long]] = {
    val idx = (0 +: cuts.sorted :+ (ring.length - 1)).distinct
    idx.sliding(2).map { case Seq(a, b) => ring.slice(a, b + 1) }.toSeq
  }

  test("chained split rings close and preserve the node cycle") {
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val n = 4 + rnd.nextInt(10)
      val ids = scala.util.Random.shuffle((1L to 100L).toList).take(n)
      val ring = ids :+ ids.head // closed cycle
      val nCuts = rnd.nextInt(3)
      val cuts = Seq.fill(nCuts)(1 + rnd.nextInt(ring.length - 2)).distinct
      val parts = split(ring, cuts)
      // randomly reverse some parts and shuffle member order
      val members = scala.util.Random.shuffle(
        parts.map(p => if (rnd.nextBoolean()) p.reverse else p)).map(mk("outer", _))
      val rings = GeometryBuilder.chain(members.toArray, close = true)
      assert(rings.length === 1, s"expected one ring from $parts")
      val out = rings.head
      assert(out.head._1 === out.last._1, "ring must be closed")
      // node cycle preserved up to rotation/orientation: drop the
      // closing node, then the output must be a rotation of the input
      // cycle or of its reverse
      val cycle = out.map(_._1).dropRight(1)
      val base = ring.dropRight(1)
      def rotations(s: Seq[Long]) = s.indices.map(i => s.drop(i) ++ s.take(i))
      assert(rotations(base).contains(cycle) || rotations(base.reverse).contains(cycle),
        s"cycle not preserved: $cycle vs $base")
    }
  }

  test("broken chains emit separate rings, never drop nodes silently") {
    // two disjoint open chains cannot merge
    val members = Array(mk("outer", Seq(1, 2, 3)), mk("outer", Seq(10, 11)))
    val rings = GeometryBuilder.chain(members, close = true)
    assert(rings.length === 2)
    // each ring closed by construction (closure appends the head)
    rings.foreach(r => assert(r.head._1 === r.last._1))
  }

  test("closed member ways stay their own rings") {
    val members = Array(mk("outer", Seq(1, 2, 3, 1)), mk("outer", Seq(5, 6, 7, 5)))
    val rings = GeometryBuilder.chain(members, close = true)
    assert(rings.length === 2)
    assert(rings.map(_.map(_._1)).toSet === Set(Seq(1L, 2L, 3L, 1L), Seq(5L, 6L, 7L, 5L)))
  }

  test("assembleRelation: >1 outer with inners drops inners (G7)") {
    val ms = Array(
      mk("outer", Seq(1, 2, 3, 1)), mk("outer", Seq(5, 6, 7, 5)),
      mk("inner", Seq(8, 9, 10, 8)))
    val out = GeometryBuilder.assembleRelation(1L, 3, ms)
    assert(out.geom_type === "MultiPolygon")
    val polys = graft.geom.Wkb.readCollection(out.geometry)
    assert(polys.length === 2)
    polys.foreach(p => assert(graft.geom.Wkb.readPolygon(p).length === 1, "no holes"))
  }
}
