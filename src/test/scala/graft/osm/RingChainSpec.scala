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

  /** The original O(k²) linear-scan greedy, kept verbatim as the
    * semantics reference for the endpoint-indexed form in
    * GeometryBuilder.chain (VERDICT r7 task 4). */
  private def chainScan(ms: Array[Member], close: Boolean): Seq[Seq[Long]] = {
    val seqs = ms.map(m => m.nodeIds.zip(m.xs.zip(m.ys))
      .map { case (n, (x, y)) => (n, x, y) }.toSeq)
    val unused = scala.collection.mutable.LinkedHashSet(seqs.indices: _*)
    val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Double, Double)]]
    while (unused.nonEmpty) {
      val start = unused.head
      unused -= start
      var ring = seqs(start)
      var extended = true
      while (extended && ring.head._1 != ring.last._1) {
        extended = false
        val endId = ring.last._1
        unused.find(i => seqs(i).head._1 == endId) match {
          case Some(i) =>
            unused -= i; ring = ring ++ seqs(i).tail; extended = true
          case None =>
            unused.find(i => seqs(i).last._1 == endId) match {
              case Some(i) =>
                unused -= i; ring = ring ++ seqs(i).reverse.tail; extended = true
              case None =>
            }
        }
      }
      rings += (if (close) GeometryBuilder.closeRing(ring) else ring)
    }
    rings.toSeq.map(_.map(_._1))
  }

  test("property: endpoint-indexed chain == linear-scan greedy (order included)") {
    val rnd = new scala.util.Random(23)
    (1 to 80).foreach { trial =>
      // a mix of split rings, closed members, disjoint fragments and
      // dead ends, shuffled and part-reversed — both forms must emit
      // the SAME rings in the SAME order
      val nGroups = 1 + rnd.nextInt(4)
      val parts = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      (0 until nGroups).foreach { g =>
        val off = 1000L * g
        val n = 3 + rnd.nextInt(8)
        val ring = (1L to n).map(_ + off) :+ (1L + off)
        val nCuts = rnd.nextInt(3)
        val cuts = Seq.fill(nCuts)(1 + rnd.nextInt(ring.length - 2)).distinct
        parts ++= split(ring, cuts)
      }
      if (rnd.nextBoolean()) parts += Seq(7000L + rnd.nextInt(5), 7100L) // dangling fragment
      val members = scala.util.Random.shuffle(parts.toList)
        .map(p => if (rnd.nextBoolean()) p.reverse else p).map(mk("outer", _))
        .toArray
      val fast = GeometryBuilder.chain(members, close = true).map(_.map(_._1))
      val slow = chainScan(members, close = true)
      assert(fast === slow, s"trial $trial diverged")
    }
  }

  test("pathological 5k-member relation chains into one closed ring (VERDICT r7 task 4)") {
    // a 5001-node admin-boundary-like ring split into 5000 two-node
    // segments, every third segment reversed — the endpoint-indexed
    // greedy is O(nodes + k log k); the old scan form was O(k²) here
    val n = 5000
    val ring = (1L to n.toLong) :+ 1L
    val segs = ring.sliding(2).toSeq.zipWithIndex.map { case (s, i) =>
      if (i % 3 == 2) s.reverse else s
    }
    // shuffle member order deterministically so chaining can't ride
    // the sorted input
    val members = new scala.util.Random(5).shuffle(segs).map(mk("outer", _)).toArray
    val t0 = System.nanoTime()
    val rings = GeometryBuilder.chain(members, close = true)
    val dt = (System.nanoTime() - t0) / 1e9
    // each cycle node has degree 2, so the tail-extending greedy must
    // walk the whole cycle from any start: ONE ring, every node once
    assert(rings.length === 1, s"expected one ring, got ${rings.length}")
    assert(rings.map(_.length - 1).sum === n, "every node exactly once")
    rings.foreach(r => assert(r.head._1 === r.last._1, "ring closed"))
    assert(dt < 5.0, f"5k-member chain took $dt%.1f s — endpoint index regressed?")
  }
}
