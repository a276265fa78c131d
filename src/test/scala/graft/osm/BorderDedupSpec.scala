package graft.osm

import org.scalatest.funsuite.AnyFunSuite
import graft.pbf.OsmPbfWriter._
import graft.sources.SparkTestSession

/** Pins the border-range dedup machinery (r22): the stats-walk id
  * ranges agree with the decoder, every cross-file duplicated key lies
  * inside a border interval (the correctness invariant of the split
  * dedup), the idRanges scan option prunes blobs, and the split path
  * equals the full-dedup fallback row-for-row. */
class BorderDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkWorld(): (String, String) = {
    val f = java.io.File.createTempFile("border", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, Seq(
      Seq(N(1, 1.0, 1.0, Seq("amenity" -> "cafe")), N(2, 1.1, 1.1)),
      Seq(N(3, 1.2, 1.2), N(4, 1.3, 1.3, Seq("amenity" -> "bar"))),
      Seq(N(5, 1.4, 1.4), N(6, 1.5, 1.5)),
      Seq(W(10, Seq(1L, 2L, 3L), Seq("highway" -> "residential"))),
      Seq(W(11, Seq(4L, 5L), Seq("highway" -> "service"))),
      Seq(R(20, Seq(("outer", 10L, 1.toByte)), Seq("type" -> "multipolygon")))))
    val dir = java.nio.file.Files.createTempDirectory("borderout").toString
    graft.ScaleProbe.splitPbf(f.getAbsolutePath, dir, 3, 1)
    (f.getAbsolutePath, dir)
  }

  test("blobIdRanges agrees with the decoded elements per blob") {
    val (single, _) = mkWorld()
    val blobs = graft.pbf.OsmPbfFile.indexAll(single)
    val conf = graft.pbf.OsmPbfFile.sharedConf
    blobs.foreach { b =>
      val block = graft.pbf.OsmPbfFile.readBlob(b, conf)
      val ranges = graft.pbf.OsmPbfFile.blobIdRanges(block)
      // decoded truth via the raw scan restricted to this blob is
      // awkward; the writer's fixture is known: derive truth from the
      // full decode of the block
      val decoded = graft.pbf.BlockDecoder
        .decode(block, Array(true, true, true), graft.pbf.DecodeNeeds(
          tags = false, refs = false, members = false, info = false,
          coords = false))
        .map(d => (d.etype.toInt, d.id)).toSeq
      (0 to 2).foreach { t =>
        val ids = decoded.collect { case (`t`, id) => id }
        if (ids.isEmpty) {
          assert(ranges(2 * t) > ranges(2 * t + 1), s"type $t should be absent")
        } else {
          assert(ranges(2 * t) === ids.min, s"type $t min")
          assert(ranges(2 * t + 1) === ids.max, s"type $t max")
        }
      }
    }
  }

  test("every cross-file duplicated key lies inside a border interval") {
    val (_, dir) = mkWorld()
    assert(!spark.sparkContext.isStopped) // stats walk needs the active session
    val ranges = OsmQueryExec.borderRanges(dir)
    assert(ranges.nonEmpty, "3-way overlap-1 split must have border intervals")
    // raw per-file keys
    val files = graft.pbf.OsmPbfFile.expand(dir, graft.pbf.OsmPbfFile.sharedConf)
    val perFile = files.map { f =>
      spark.read.format("osmpbf").load(f)
        .select("type", "id").collect()
        .map(r => (r.getByte(0).toInt, r.getLong(1))).toSet
    }
    val dups = perFile.combinations(2).flatMap(p => p(0) intersect p(1)).toSet
    assert(dups.nonEmpty, "the split must duplicate border elements")
    dups.foreach { case (t, id) =>
      assert(ranges.exists { case (rt, lo, hi) => rt == t && id >= lo && id <= hi },
        s"duplicated key ($t,$id) outside every border interval $ranges")
    }
  }

  test("idRanges option prunes blobs; split path equals full-dedup fallback") {
    val (_, dir) = mkWorld()
    assert(!spark.sparkContext.isStopped) // stats walk needs the active session
    val ranges = OsmQueryExec.borderRanges(dir)
    val ser = graft.sources.OsmPbfSource.serializeIdRanges(ranges)
    assert(graft.sources.OsmPbfSource.parseIdRanges(ser) === ranges)
    val all = spark.read.format("osmpbf").load(dir)
    val pruned = spark.read.format("osmpbf").option("idRanges", ser).load(dir)
    // pruning is blob-granular: a strict subset of raw rows, and a
    // SUPERSET of the rows actually inside the intervals
    assert(pruned.count() < all.count())
    val inRange = ranges.map { case (t, lo, hi) =>
      org.apache.spark.sql.functions.col("type") === t &&
        org.apache.spark.sql.functions.col("id").between(lo, hi)
    }.reduce(_ || _)
    assert(pruned.filter(inRange).count() === all.filter(inRange).count(),
      "blob pruning must not drop in-range rows")

    // end-to-end: split dedup == full-dedup fallback, row for row
    def rows(frac: String) = {
      spark.conf.set("spark.graft.osm.borderBlobFrac", frac)
      try OsmQueryExec.scan(spark, dir).select("type", "id")
        .collect().map(r => (r.getByte(0), r.getLong(1))).sorted.toSeq
      finally spark.conf.unset("spark.graft.osm.borderBlobFrac")
    }
    assert(rows("1.0") === rows("0"))
  }
}
