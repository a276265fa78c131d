package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.multimodal.MultimodalOps

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("windowedCounts over readStream matches the batch result") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val expected = EventsStream.windowedCounts(batchDf)
      .orderBy("window_start_s", "event_type").collect().toSeq

    // FileStreamSource needs a directory, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = batchDf.schema
    val streamIn = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
    val q = EventsStream.windowedCounts(streamIn)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .orderBy("window_start_s", "event_type").collect().toSeq
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sessionize splits on >30min gaps") {
    import spark.implicits._
    val h = 3600L * 1000000000L
    val rows = Seq( // (event_id, ts_ns, user_id)
      (1L, 0L * h, 7L), (2L, 0L * h + 60L * 1000000000L, 7L), // same session
      (3L, 2L * h, 7L), // new session
      (4L, 0L, 8L))
      .toDF("event_id", "ts", "user_id")
    val got = EventsStream.sessionize(rows).orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 7L, 0L), (2L, 7L, 0L), (3L, 7L, 1L), (4L, 8L, 0L)))
  }
}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("binary media plumbing: schema, batched extraction, stub decode determinism") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = MultimodalOps.docsAsMedia(docs)
    assert(media.schema("media").dataType === BinaryType)
    val feats = MultimodalOps.extractFeatures(spark, media).orderBy("id").collect()
    assert(feats.length === docs.count())
    val f0 = feats.head
    // deterministic: run twice, same fingerprints
    val feats2 = MultimodalOps.extractFeatures(spark, media).orderBy("id").collect()
    assert(feats.map(_.getAs[Long]("fingerprint")).toSeq ===
      feats2.map(_.getAs[Long]("fingerprint")).toSeq)
    // n_bytes equals text length for ASCII corpus
    val n0 = docs.orderBy("doc_id").select(length(col("text"))).head().getInt(0)
    assert(f0.getAs[Int]("n_bytes") === n0)
    assert(f0.getAs[Double]("entropy") > 0.0)
  }

  test("stub codec: histogram features on known payload") {
    val f = MultimodalOps.MediaCodec.features(1L, "aabb".getBytes("UTF-8"))
    assert(f.n_bytes === 4 && f.n_distinct_bytes === 2)
    assert(math.abs(f.entropy - 1.0) < 1e-9) // two symbols, equal mass
  }
}
