package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pbf.OsmPbfWriter._
import graft.sources.SparkTestSession

/** Pins the multi-file corpus contract at fixture scale: splitting one
  * extract into border-overlapping region files (ScaleProbe.splitPbf)
  * duplicates blobs on disk, and the scan-side (type, id) border dedup
  * makes every query see each element exactly once — identical results
  * to the single file. */
class ScaleProbeSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("splitPbf duplicates border blobs; dedup restores single-file results") {
    val f = java.io.File.createTempFile("split", ".osm.pbf")
    f.deleteOnExit()
    // 6 blocks so a 3-way split has real interior borders
    write(f.getAbsolutePath, Seq(
      Seq(N(1, 1.0, 1.0, Seq("amenity" -> "cafe")), N(2, 1.1, 1.1)),
      Seq(N(3, 1.2, 1.2), N(4, 1.3, 1.3, Seq("amenity" -> "bar"))),
      Seq(N(5, 1.4, 1.4), N(6, 1.5, 1.5)),
      Seq(W(10, Seq(1L, 2L, 3L), Seq("highway" -> "residential"))),
      Seq(W(11, Seq(4L, 5L), Seq("highway" -> "service"))),
      Seq(R(20, Seq(("outer", 10L, 1.toByte)), Seq("type" -> "multipolygon")))))
    val dir = java.nio.file.Files.createTempDirectory("splitout").toString

    val dup = ScaleProbe.splitPbf(f.getAbsolutePath, dir, 3, 1)
    assert(dup === 2, "3 regions with overlap 1 duplicate exactly 2 border blobs")

    // raw multi-file scan sees the duplicated elements...
    val raw = spark.read.format("osmpbf").load(dir)
    val single = spark.read.format("osmpbf").load(f.getAbsolutePath)
    assert(raw.count() > single.count())

    // ...but the OsmFile surface and the query path dedup to identity
    // ("blobs" is a physical stat: 6 + 2 duplicated border blobs)
    val infoM = new graft.osm.OsmFile(spark, dir).info()
    val infoS = new graft.osm.OsmFile(spark, f.getAbsolutePath).info()
    assert(infoM("blobs") === 8L && infoS("blobs") === 6L)
    assert(infoM - "blobs" === infoS - "blobs")
    def pois(p: String) = graft.osm.OsmQuery.pois.run(spark, p)
      .select("osmid").collect().map(_.getLong(0)).toSet
    assert(pois(dir) === pois(f.getAbsolutePath))
    def topo(p: String) = graft.osm.OsmQuery.highways
      .copy(geometry = true, topology = true).run(spark, p).count()
    assert(topo(dir) === topo(f.getAbsolutePath))
    // border-duplicated ways must not double their vertices: highway
    // geometry WKB identical across the two corpora
    def geomHash(p: String) = graft.osm.OsmQuery.highways.copy(geometry = true)
      .run(spark, p).select(col("osmid"), hex(col("geometry")).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(geomHash(dir) === geomHash(f.getAbsolutePath))
  }
}
