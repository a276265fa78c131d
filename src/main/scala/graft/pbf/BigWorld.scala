package graft.pbf

import OsmPbfWriter._

/** Deterministic large synthetic extract for scale testing the scan
  * path: city-like grid of dense nodes (a fraction tagged as POIs),
  * chained highway ways over the grid (sharing junction nodes), and
  * closed building ways — blocked at the OSM-conventional ~8000
  * elements per PrimitiveBlock so blob-parallelism matches real
  * extracts. Generation is deterministic (seeded). */
object BigWorld {

  val BlockSize = 8000

  /** The deterministic element model — exposed so the oracle-side
    * fixture tables (graft.queries.OsmOracle) can be derived from the
    * same generator truth rather than from the engine's read path. */
  def model(nNodes: Int, nWays: Int): (Seq[Elem], Seq[Elem]) = {
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

    (nodes, ways)
  }

  def generate(path: String, nNodes: Int, nWays: Int): Unit = {
    val (nodes, ways) = model(nNodes, nWays)
    val blocks = (nodes.grouped(BlockSize) ++ ways.grouped(BlockSize)).toSeq
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
