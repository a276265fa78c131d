package graft.pbf

import OsmPbfWriter._

/** Deterministic large synthetic extract for scale testing the scan
  * path: city-like grid of dense nodes (a fraction tagged as POIs),
  * chained highway ways over the grid (sharing junction nodes), closed
  * building ways, and multipolygon building relations (split outer
  * rings + an inner hole — the per-relation ring-chaining path G6 at
  * volume) — blocked at the OSM-conventional ~8000 elements per
  * PrimitiveBlock so blob-parallelism matches real extracts.
  * Generation is deterministic (seeded). */
object BigWorld {

  val BlockSize = 8000

  /** The deterministic element model — exposed so the oracle-side
    * fixture tables (graft.queries.OsmOracle) can be derived from the
    * same generator truth rather than from the engine's read path.
    * Returns (nodes, ways incl. untagged ring-member ways, relations). */
  def model(nNodes: Int, nWays: Int): (Seq[Elem], Seq[Elem], Seq[Elem]) = {
    val rnd = new scala.util.Random(42)
    val amenities = Array("cafe", "bench", "school", "fuel", "bank")

    val nodes: Seq[Elem] = (0 until nNodes).map { i =>
      val lat = 43.0 + (i % 4096) * 1e-4
      val lon = 5.0 + (i / 4096) * 1e-4
      val tags =
        if (rnd.nextInt(50) == 0) Seq("amenity" -> amenities(rnd.nextInt(amenities.length)))
        else Nil
      N(i.toLong, lat, lon, tags)
    }

    // highways: chains of consecutive node ids; every way starts where
    // the previous ended → shared junction nodes for topology
    val highwayTypes = Array("residential", "primary", "service", "tertiary")
    val ways: Seq[Elem] = (0 until nWays).map { w =>
      val kind = highwayTypes(w % highwayTypes.length)
      if (w % 10 == 9) {
        // closed building square over 4 grid nodes
        val base = rnd.nextInt(nNodes - 4200)
        W(nNodes + w.toLong, Seq(base.toLong, base + 1L, base + 4097L, base + 4096L, base.toLong),
          Seq("building" -> "yes"))
      } else {
        val len = 3 + rnd.nextInt(6)
        val start = (w * 37) % (nNodes - len - 1)
        W(nNodes + w.toLong, (0 to len).map(k => (start + k).toLong),
          Seq("highway" -> kind))
      }
    }

    // multipolygon relations over 3x3 grid-cell squares: the outer ring
    // arrives as TWO open member ways (odd relations carry the second
    // half in reversed orientation, forcing the greedy chainer's
    // tail-reversal branch), plus one closed inner ring — per-relation
    // sequential assembly (G3-G8) at volume. Outer member ways wa/wb
    // are untagged, so POI/highway/topology surfaces are unchanged by
    // the relations (the rels draw from the rnd stream AFTER
    // nodes+ways, so their content is unchanged too). The inner ring
    // wc is building-tagged, and every 8th relation is a NON-building
    // multipolygon (landuse=forest): a buildings query must suppress
    // wc under a building relation (J6 member anti-join at volume) but
    // KEEP wc under a forest relation, whose parent never enters the
    // result set — the two J6 directions the member-suppression
    // semantics can silently diverge on (ADVICE r7).
    val nRels = nWays / 20
    val ringBase = nNodes.toLong + nWays
    val relBase = ringBase + 3L * nRels
    val relElems: Seq[(Elem, Elem, Elem, Elem)] = (0 until nRels).map { r =>
      val base = rnd.nextInt(nNodes - 3 * 4096 - 4).toLong
      def nid(dr: Int, dc: Int): Long = base + dr + 4096L * dc
      val aRefs = Seq(nid(0, 0), nid(1, 0), nid(2, 0), nid(3, 0), nid(3, 1), nid(3, 2), nid(3, 3))
      val bRefs0 = Seq(nid(3, 3), nid(2, 3), nid(1, 3), nid(0, 3), nid(0, 2), nid(0, 1), nid(0, 0))
      val bRefs = if (r % 2 == 1) bRefs0.reverse else bRefs0
      val forest = r % 8 == 7
      val wa = W(ringBase + 3L * r, aRefs)
      val wb = W(ringBase + 3L * r + 1, bRefs)
      val wc = W(ringBase + 3L * r + 2,
        Seq(nid(1, 1), nid(2, 1), nid(2, 2), nid(1, 2), nid(1, 1)),
        Seq("building" -> "yes"))
      val rel = R(relBase + r,
        Seq(("outer", wa.id, 1.toByte), ("outer", wb.id, 1.toByte), ("inner", wc.id, 1.toByte)),
        if (forest) Seq("type" -> "multipolygon", "landuse" -> "forest")
        else Seq("type" -> "multipolygon", "building" -> "yes"))
      (wa, wb, wc, rel)
    }
    val ringWays: Seq[Elem] = relElems.flatMap(t => Seq(t._1, t._2, t._3))
    val rels: Seq[Elem] = relElems.map(_._4)

    (nodes, ways ++ ringWays, rels)
  }

  def generate(path: String, nNodes: Int, nWays: Int): Unit = {
    val (nodes, ways, rels) = model(nNodes, nWays)
    val blocks =
      (nodes.grouped(BlockSize) ++ ways.grouped(BlockSize) ++ rels.grouped(BlockSize)).toSeq
    OsmPbfWriter.write(path, blocks)
  }

  /** Generate-once helper for benches. */
  def ensure(path: String, nNodes: Int, nWays: Int): String = {
    val f = new java.io.File(path)
    if (!f.exists()) {
      f.getParentFile.mkdirs()
      generate(path, nNodes, nWays)
    }
    path
  }
}
