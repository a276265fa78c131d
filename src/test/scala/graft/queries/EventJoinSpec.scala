package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Edge semantics of the event as-of and range joins, pinned on a
  * handcrafted frame (the oracle gate only sees the synthetic corpus,
  * where boundary cases may not occur). The production queries read
  * `events.parquet` with ts as raw nanosecond longs
  * (`nanosAsLong`), so the fixture writes a LongType ts. */
class EventJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val us = 1000L // 1 µs in ns
  private val min30 = 1800L * 1000000000L
  private val hour = 3600L * 1000000000L

  /** (event_id, ts_ns, user_id, event_type, value) rows → a temp dir
    * holding events.parquet, returned for the (spark, dir) contract. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evjoin").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("as-of join: latest-prior view, null before first view, ties on ts by event_id") {
    val dir = eventsDir(Seq(
      // user 1: plain backward match
      (10L, 100L * us, 1L, "view", 0.0),
      (11L, 200L * us, 1L, "click", 0.0),
      // user 2: click before any view -> NULL (left-join semantics)
      (20L, 50L * us, 2L, "click", 0.0),
      // user 3: the LATER of two prior views wins
      (21L, 100L * us, 3L, "view", 0.0),
      (22L, 150L * us, 3L, "view", 0.0),
      (23L, 160L * us, 3L, "click", 0.0),
      // user 4: a view strictly AFTER the click must not match
      (30L, 100L * us, 4L, "click", 0.0),
      (31L, 150L * us, 4L, "view", 0.0),
      // user 5: view at the SAME ts as the click, smaller event_id ->
      // ordered before the click in (ts, event_id), so it matches, gap 0
      (40L, 100L * us, 5L, "view", 0.0),
      (41L, 100L * us, 5L, "click", 0.0)))
    val got = PipelineOps.queries("ev_asof_join")(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(got === Seq(
      (11L, Some(10L), Some(100L)), // 100 µs gap
      (20L, None, None),
      (23L, Some(22L), Some(10L)),
      (30L, None, None),
      (41L, Some(40L), Some(0L))))
  }

  test("range join: half-open [ts, ts+30min) window, bucket-crossing matches found") {
    val base = 10L * hour + hour - 60L * 1000000000L // 60 s before an hour boundary
    val dir = eventsDir(Seq(
      // the probe (event_id % 200 == 0); its window crosses the hour
      // boundary into the next bucket
      (200L, base, 1L, "view", 1.0),
      // in-window, same bucket as the probe
      (1L, base + 30L * 1000000000L, 2L, "view", 2.0),
      // in-window but in the NEXT hour bucket — only reachable because
      // the probe exploded into both covered buckets
      (2L, base + 600L * 1000000000L, 3L, "view", 4.0),
      // exactly at the window end: half-open, excluded
      (3L, base + min30, 4L, "view", 8.0),
      // 1 µs before the window end: included
      (4L, base + min30 - us, 5L, "view", 16.0),
      // strictly before the window start: excluded
      (5L, base - us, 6L, "view", 32.0)))
    val got = PipelineOps.queries("ev_range_join")(spark, dir).collect().toSeq
    assert(got === Seq(Row(200L, 4L, 23.0))) // probe itself + ids 1, 2, 4
  }

  test("as-of join matches a brute-force per-click scan on random events (seeded)") {
    val rnd = new scala.util.Random(0xa50f)
    val types = Array("view", "click", "purchase")
    // deliberately coarse ts grid so same-(user, ts) collisions occur
    // and the (ts, event_id) tie order is exercised
    val evs = (1L to 600L).map { id =>
      (id, (rnd.nextInt(40) * 25L) * us, rnd.nextInt(20).toLong + 1L,
        types(rnd.nextInt(types.length)), 0.0)
    }
    val expected = evs.filter(_._4 == "click").sortBy(_._1).map { c =>
      val prior = evs.filter(v => v._4 == "view" && v._3 == c._3 &&
        (v._2 < c._2 || (v._2 == c._2 && v._1 < c._1)))
      val best = if (prior.isEmpty) None else Some(prior.maxBy(v => (v._2, v._1)))
      (c._1, best.map(_._1), best.map(v => c._2 / 1000 - v._2 / 1000))
    }
    val got = PipelineOps.queries("ev_asof_join")(spark, eventsDir(evs)).collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(got === expected)
    assert(expected.exists(_._2.isEmpty) && expected.exists(_._2.nonEmpty),
      "seeded frame must exercise both the matched and the no-prior-view branch")
  }

  test("asofStream (stateful streaming twin) matches the batch as-of join") {
    import graft.streaming.EventsStream
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val expected = PipelineOps.queries("ev_asof_join")(spark, dir)
      .collect().toSeq

    val streamDir = java.nio.file.Files.createTempDirectory("asofstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val sin = spark.readStream.schema(batch.schema).parquet(streamDir.toString)
    val q = EventsStream.asofStream(spark, sin)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("asof_out").orderBy("click_id").collect().toSeq
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("as-of join plans as a single window aggregation — no join operator") {
    val dir = eventsDir(Seq((10L, 100L * us, 1L, "view", 0.0),
      (11L, 200L * us, 1L, "click", 0.0)))
    val physical = PipelineOps.queries("ev_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(physical.contains("Window"))
    val joinOps = ("(?i)(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|" +
      "BroadcastNestedLoopJoin|CartesianProduct)").r
    assert(joinOps.findFirstIn(physical).isEmpty,
      s"as-of must not plan a join:\n$physical")
  }
}
