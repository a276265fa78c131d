package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pbf.OsmPbfWriter._

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
}

class OsmPbfSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture(): String = {
    val f = java.io.File.createTempFile("srcpbf", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, Seq(
      Seq(
        N(1, 43.51, 5.41, Seq("amenity" -> "cafe")),
        N(2, 43.52, 5.42),
        N(3, 43.53, 5.43, Seq("amenity" -> "bench", "name" -> "b1"),
          Some(Info(2, 1600000000L, 55)))),
      Seq(
        W(10, Seq(1L, 2L, 3L), Seq("highway" -> "residential")),
        W(11, Seq(3L, 2L, 1L, 3L), Seq("building" -> "yes"))),
      Seq(
        R(20, Seq(("outer", 10L, 1.toByte), ("inner", 11L, 1.toByte)),
          Seq("type" -> "multipolygon")))))
    f.getAbsolutePath
  }

  test("reads all element types with full schema") {
    val df = spark.read.format("osmpbf").load(fixture())
    assert(df.count() === 6)
    val byType = df.groupBy("type").count().collect()
      .map(r => r.getByte(0) -> r.getLong(1)).toMap
    assert(byType === Map(0.toByte -> 3L, 1.toByte -> 2L, 2.toByte -> 1L))
    val cafe = df.filter(element_at(col("tags"), "amenity") === "cafe").collect()
    assert(cafe.length === 1 && cafe.head.getAs[Long]("id") === 1L)
    val w11 = df.filter(col("id") === 11 && col("type") === 1).collect().head
    assert(w11.getSeq[Long](w11.fieldIndex("refs")) === Seq(3L, 2L, 1L, 3L))
    val r20 = df.filter(col("type") === 2).collect().head
    val members = r20.getSeq[org.apache.spark.sql.Row](r20.fieldIndex("members"))
    assert(members.map(m => (m.getString(0), m.getLong(1), m.getByte(2))) ===
      Seq(("outer", 10L, 1.toByte), ("inner", 11L, 1.toByte)))
    val n3 = df.filter(col("id") === 3 && col("type") === 0).collect().head
    assert(n3.getAs[Int]("version") === 2)
    assert(n3.getAs[java.sql.Timestamp]("timestamp").getTime === 1600000000000L)
  }

  test("one partition per blob") {
    val df = spark.read.format("osmpbf").load(fixture())
    assert(df.rdd.getNumPartitions === 3)
  }

  test("SQL DDL surface: CREATE TEMPORARY VIEW ... USING osmpbf") {
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW osm_sql
          USING osmpbf OPTIONS (path '${fixture()}')""")
    val cafes = spark.sql(
      "SELECT id, tags['amenity'] AS amenity FROM osm_sql WHERE type = 0 AND tags['amenity'] IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(cafes.toSeq.contains((1L, "cafe")))
    assert(spark.sql("SELECT count(*) AS n FROM osm_sql").head().getLong(0) === 6L)
    spark.sql("DROP VIEW osm_sql")
  }

  test("mustTagKeys scan option filters inside the decoder") {
    val df = spark.read.format("osmpbf")
      .option("mustTagKeys", "amenity").load(fixture())
    val got = df.collect()
    // only elements carrying an 'amenity' key survive the decode
    assert(got.nonEmpty)
    assert(got.forall(r =>
      r.getMap[String, String](r.fieldIndex("tags")).contains("amenity")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("mustTags=amenity"), s"plan:\n$plan")
    // a key absent from every string table yields nothing (block skip)
    assert(spark.read.format("osmpbf")
      .option("mustTagKeys", "no_such_key").load(fixture()).count() === 0L)
  }

  test("mustTagKeys still filters when the tags column is pruned") {
    val base = spark.read.format("osmpbf")
      .option("mustTagKeys", "amenity").load(fixture())
    val full = base.collect().map(_.getLong(0)).toSet
    assert(full.nonEmpty)
    // pruned projection (and count) must see the same elements — the
    // decoder keeps reading tag keys for the check
    assert(base.select("id").collect().map(_.getLong(0)).toSet === full)
    assert(base.count() === full.size)
  }

  test("MustTagPushdown rule injects the scan option for plain filters") {
    val base = spark.read.format("osmpbf").load(fixture())
    // map_contains_key form
    val expected = base.collect()
      .filter(_.getMap[String, String](4).contains("amenity"))
      .map(_.getLong(0)).toSet
    val d1 = base.filter(expr("map_contains_key(tags, 'amenity')"))
    assert(d1.queryExecution.executedPlan.toString.contains("mustTags=amenity"))
    assert(d1.collect().map(_.getLong(0)).toSet === expected && expected.nonEmpty)
    // tags['k'] IS NOT NULL form, via SQL
    base.createOrReplaceTempView("osm_rule")
    val d2 = spark.sql("SELECT id FROM osm_rule WHERE tags['highway'] IS NOT NULL")
    assert(d2.queryExecution.executedPlan.toString.contains("mustTags=highway"))
    // arrays_overlap form picks the literal key set
    val d3 = base.filter(expr(
      "arrays_overlap(map_keys(tags), array('shop', 'amenity'))"))
    assert(d3.queryExecution.executedPlan.toString.contains("mustTags="))
    assert(d3.count() >= expected.size)
    // value-equality form implies the key too
    val d4 = base.filter(col("tags")("amenity") === "cafe")
    assert(d4.queryExecution.executedPlan.toString.contains("mustTags=amenity"))
    assert(d4.count() === 1)
    // non-tag filters leave the scan alone
    val d5 = base.filter(col("id") > 0)
    assert(!d5.queryExecution.executedPlan.toString.contains("mustTags="))
  }

  test("split packing follows the FilePartition formula") {
    def b(len: Int) = graft.pbf.BlobInfo("f", 0L, len)
    // large blobs coalesce toward maxSplit
    val packed = OsmPbfScan.packBlobs(Seq.fill(8)(b(40)), maxSplit = 100, openCost = 0)
    assert(packed.map(_.size) === Seq(2, 2, 2, 2))
    // openCost padding keeps tiny blobs on separate tasks (parallelism
    // for a single small extract)
    val tiny = OsmPbfScan.packBlobs(Seq.fill(3)(b(10)), maxSplit = 100, openCost = 100)
    assert(tiny.map(_.size) === Seq(1, 1, 1))
    // order is preserved and nothing is dropped
    val mixed = OsmPbfScan.packBlobs(
      Seq(b(10), b(90), b(150), b(10), b(10)), maxSplit = 100, openCost = 0)
    assert(mixed.flatten.size === 5)
    assert(mixed.map(_.map(_.dataLen)) === Seq(Seq(10, 90), Seq(150), Seq(10, 10)))
  }

  test("type and id filters are pushed into the scan") {
    val df = spark.read.format("osmpbf").load(fixture())
    val plan = df.filter(col("type") === 1).queryExecution.executedPlan.toString
    assert(plan.contains("OsmPbfScan") && plan.contains("types=way"),
      s"expected pushed type filter in plan:\n$plan")
    assert(df.filter(col("type") === 1).count() === 2)
    assert(df.filter(col("id").isin(1, 20)).count() === 2)
  }

  test("directory of pbf files scans as one table (multi-file corpus)") {
    val dir = java.nio.file.Files.createTempDirectory("multipbf")
    write(dir.resolve("a.osm.pbf").toString, Seq(Seq(
      N(1, 0.0, 0.0, Seq("amenity" -> "cafe")), N(2, 1.0, 1.0))))
    write(dir.resolve("b.osm.pbf").toString, Seq(Seq(
      N(10, 2.0, 2.0), W(20, Seq(1L, 2L), Seq("highway" -> "service")))))
    val df = spark.read.format("osmpbf").load(dir.toString)
    assert(df.count() === 4)
    assert(df.rdd.getNumPartitions === 2) // one blob per file
    assert(df.filter(col("type") === 1).count() === 1)
  }

  test("blob-level partition pruning from pushed type filter (F10)") {
    val df = spark.read.format("osmpbf").load(fixture())
    // fixture has 3 blobs: nodes, ways, relations — a relations-only
    // scan must plan exactly 1 partition after the stats pass
    val rels = df.filter(col("type") === 2)
    assert(rels.rdd.getNumPartitions === 1)
    assert(rels.count() === 1)
    val ways = df.filter(col("type").isin(1, 2))
    assert(ways.rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the decoder") {
    val df = spark.read.format("osmpbf").load(fixture())
      .select("id", "type")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=id,type"), s"plan:\n$scanDesc")
    assert(df.count() === 6)
  }

  test("scan reports finite planner statistics that shrink under type pruning") {
    val path = fixture()
    import org.apache.spark.sql.types.StructType
    def est(wantTypes: Array[Boolean]): Long =
      new OsmPbfScan(path, StructType(Nil), wantTypes, None)
        .estimateStatistics().sizeInBytes.getAsLong
    val full = est(Array(true, true, true))
    val relsOnly = est(Array(false, false, true))
    assert(full > 0L && full < Long.MaxValue / 4,
      "without reported statistics a DSv2 scan sizes as infinite and can never broadcast")
    assert(relsOnly < full,
      "type pruning must shrink the estimate (relation blobs are a fraction of the file)")
    // conservative direction: at least the compressed payload size
    assert(full >= OsmPbfScan.prunedBlobs(path, Array(true, true, true))
      .map(_.dataLen.toLong).sum)
  }

  test("a tiny extract's scan becomes the broadcast side of an equi-join") {
    import spark.implicits._
    // the point of reporting statistics: joins against small extracts
    // should broadcast the scan instead of shuffling the other side —
    // with DSv2's default (infinite) size estimate this plans as a
    // shuffle join regardless of actual file size
    val nodes = spark.read.format("osmpbf").load(fixture())
      .filter(col("type") === 0).select(col("id").as("nid"), col("lat"))
    val probe = (1L to 1000L).toDF("ref")
    val joined = probe.join(nodes, col("ref") === col("nid"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the KB-sized node scan to broadcast:\n$plan")
    assert(joined.count() === 3)
  }
}
