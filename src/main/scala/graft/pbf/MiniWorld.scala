package graft.pbf

import OsmPbfWriter._

/** The committed demo fixture content (fixtures/mini.pbf): a small OSM
  * world covering every geometry/topology path — POI nodes, a closed
  * building way, highways sharing a junction, a multipolygon relation
  * whose outer ring is chained from 3 part-ways (one reversed) plus an
  * inner ring, a node-member relation (no geometry, Q6) and a route
  * relation. Layout mirrors a real extract: one dense-node blob, one
  * way blob, one relation blob (BASELINE.md "blocks by content"). */
object MiniWorld {

  val nodes: Seq[Elem] = Seq(
    N(1, 43.500, 5.400, Seq("amenity" -> "cafe", "name" -> "c1"),
      Some(Info(3, 1600000000L, 42))),
    N(2, 43.501, 5.401, Seq("amenity" -> "bench"), Some(Info(1, 1600000100L, 43))),
    N(3, 43.502, 5.402, Seq("shop" -> "bakery")),
    N(10, 0.0, 0.0), N(11, 0.0, 1.0), N(12, 1.0, 1.0), N(13, 1.0, 0.0),
    N(20, 10.0, 10.0), N(21, 10.0, 11.0), N(22, 10.0, 12.0),
    N(23, 11.0, 11.0), N(24, 12.0, 11.0),
    N(30, 0.0, 0.0), N(31, 0.0, 4.0), N(32, 4.0, 4.0), N(33, 4.0, 0.0),
    N(34, 1.0, 1.0), N(35, 1.0, 2.0), N(36, 2.0, 2.0), N(37, 2.0, 1.0))

  val ways: Seq[Elem] = Seq(
    W(100, Seq(10L, 11L, 12L, 13L, 10L), Seq("building" -> "yes")),
    W(101, Seq(20L, 21L, 22L), Seq("highway" -> "residential", "name" -> "A")),
    W(102, Seq(21L, 23L, 24L), Seq("highway" -> "service", "name" -> "B")),
    W(103, Seq(20L, 22L), Seq("highway" -> "residential", "area" -> "yes")),
    W(110, Seq(30L, 31L), Nil),
    W(111, Seq(31L, 32L, 33L), Nil),
    W(112, Seq(30L, 33L), Nil),
    W(113, Seq(34L, 35L, 36L, 37L, 34L), Nil),
    W(114, Seq(10L, 11L, 12L, 10L), Seq("building" -> "yes")))

  val relations: Seq[Elem] = Seq(
    R(200, Seq(("outer", 110L, 1.toByte), ("outer", 111L, 1.toByte),
      ("outer", 112L, 1.toByte), ("inner", 113L, 1.toByte)),
      Seq("type" -> "multipolygon", "building" -> "yes")),
    R(201, Seq(("", 1L, 0.toByte), ("outer", 110L, 1.toByte)),
      Seq("type" -> "multipolygon", "building" -> "yes")),
    R(202, Seq(("", 101L, 1.toByte), ("", 102L, 1.toByte)),
      Seq("type" -> "route", "route" -> "bus")))

  val blocks: Seq[Seq[Elem]] = Seq(nodes, ways, relations)

  val path: String = "/root/repo/fixtures/mini.pbf"

  def generate(to: String = path): Unit = {
    new java.io.File(to).getParentFile.mkdirs()
    write(to, blocks)
  }
}
