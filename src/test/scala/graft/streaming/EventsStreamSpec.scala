package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.multimodal.MultimodalOps

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hitterKey: user and event-tail key spaces are disjoint at any magnitude") {
    // ADVICE r13 #3: the old additive offset aliased user_id >= 1e6
    // with event-tail keys. Low-bit tagging keeps them disjoint for
    // every id this side of Long overflow.
    val ids = Seq(0L, 1L, 3L, 999999L, 1000000L, 1000001L, 123456789L, (1L << 40))
    val userKeys = ids.map(u => EventsStream.hitterKey(2L, u)).toSet
    val eventKeys = ids.map(e => EventsStream.hitterKey(e * 2 + 1, 7L)).toSet
    assert(userKeys.forall(k => (k & 1L) == 0L), "user keys must be even-tagged")
    assert(eventKeys.forall(k => (k & 1L) == 1L), "event tail keys must be odd-tagged")
    assert(userKeys.intersect(eventKeys).isEmpty)
    assert(ids.forall(u => EventsStream.hitterKey(2L, u) >= 0L),
      "sentinel disjointness relies on real keys staying non-negative")
  }

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

  test("slidingCounts over readStream matches batch and the ev_sliding_agg query") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val expected = EventsStream.slidingCounts(batchDf)
      .orderBy("window_start_s", "event_type").collect().toSeq

    // the integer-bucket batch query is the same aggregation: counts
    // must agree window for window (fixture epochs are far from 0, so
    // the query's ws >= 0 guard is inert)
    val queryRows = graft.queries.PipelineOps.queries("ev_sliding_agg")(spark, dir)
      .orderBy("window_start_s", "event_type").collect().toSeq
    assert(expected.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ===
      queryRows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))

    val streamDir = java.nio.file.Files.createTempDirectory("evslide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamIn = spark.readStream.schema(batchDf.schema)
      .parquet(streamDir.toString)
    val q = EventsStream.slidingCounts(streamIn)
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("slide_out")
        .orderBy("window_start_s", "event_type").collect().toSeq
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("slidingCounts drops pre-epoch window starts like the batch query") {
    import spark.implicits._
    // one event 10 min after the epoch: window(1h, 15m) covers it with
    // starts -45/-30/-15/0 min; the ws >= 0 rule keeps exactly one
    val near = Seq((1L, 600L * 1000000000L, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventsStream.slidingCounts(near)
      .orderBy("window_start_s").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, "view", 1L)),
      s"near-epoch sliding windows diverged from the batch twin's ws >= 0 rule: $got")
  }

  test("watermark drops late events in append mode") {
    import spark.implicits._
    val h = 3600L * 1000000000L // 1h in ns
    val dir = java.nio.file.Files.createTempDirectory("late").toString
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: events in hours 0 and 2 — watermark advances to 1h50m
    writeBatch("b1", Seq(
      (1L, 10L, 1L, "a", 1.0, "{}"),
      (2L, 2L * h, 1L, "a", 1.0, "{}")))

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    val sin = spark.readStream.schema(schema).parquet(s"$dir/*")
    val q = EventsStream.windowedCounts(sin)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a fresh event at hour 5 plus a LATE event for hour 0
      // (behind the 1h50m watermark) — the late one must be dropped
      writeBatch("b2", Seq(
        (3L, 5L * h, 1L, "a", 1.0, "{}"),
        (4L, 20L, 1L, "a", 100.0, "{}")))
      q.processAllAvailable()
      // one more batch to push the watermark past hour 5 and flush
      writeBatch("b3", Seq((5L, 7L * h, 1L, "a", 1.0, "{}")))
      q.processAllAvailable()
      val out = spark.table("late_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // hour-0 window finalized with ONLY the on-time event (n=1, sum=1.0)
      assert(out(0L) === ((1L, 1.0)), s"late event leaked into $out")
      assert(out.contains(2L * 3600) && out.contains(5L * 3600))
    } finally q.stop()
  }

  test("streaming dedup keeps exactly one event per (user, type) key") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val expectedKeys = batchDf.select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // valid event ids per key (arrival order in the stream is
    // nondeterministic, so any member of the key group may survive)
    val members = batchDf.select("event_id", "user_id", "event_type")
      .collect().map(r => (r.getLong(1), r.getString(2)) -> r.getLong(0))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

    val streamDir = java.nio.file.Files.createTempDirectory("evdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val sin = spark.readStream.schema(batchDf.schema).parquet(streamDir.toString)
    val q = EventsStream.dedupStream(sin)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(r => ((r.getLong(1), r.getString(2)), r.getLong(0)))
      assert(got.map(_._1).toSet === expectedKeys, "key sets differ")
      assert(got.length === expectedKeys.size, "more than one row for some key")
      got.foreach { case (k, eid) =>
        assert(members(k).contains(eid), s"emitted $eid is not an event of key $k")
      }
    } finally q.stop()
  }

  test("stream-stream view-click join matches the batch result") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val expected = EventsStream.viewClickJoin(batchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture should contain view->click pairs")

    val streamDir = java.nio.file.Files.createTempDirectory("evssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val sin = spark.readStream.schema(batchDf.schema).parquet(streamDir.toString)
    val q = EventsStream.viewClickJoin(sin)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
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
