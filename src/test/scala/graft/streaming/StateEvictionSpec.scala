package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Idle-key state eviction for the stateful twins (VERDICT r14 #2):
  * content per key was bounded, but the key POPULATION was not — a
  * user seen once held a state-store entry forever. attributionStream
  * and pathsStream now evict keys idle past their horizon via
  * event-time timeout; this pins (a) the state count actually
  * SHRINKING once the watermark passes an idle key's horizon, and
  * (b) the emitted output staying exactly what the un-evicted run
  * produces on the same stream (attribution eviction is
  * semantics-preserving; paths holds whenever no user idles past the
  * horizon — this fixture's gap is 20 days against a 7-day horizon
  * for the EVICTED user only after their output is complete). */
class StateEvictionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  private val T0 = 1700000000000000L // µs
  private val Hour = 3600000000L
  private val Day = 86400000000L

  private def ev(id: Long, uid: Long, us: Long, typ: String): Row =
    Row(id, uid, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)), typ)

  /** Feed chunks as micro-batches; return (sink rows, state-store row
    * count observed after each chunk's batches). */
  private def run(name: String, chunks: Seq[Seq[Row]],
      twin: DataFrame => DataFrame): (DataFrame, Seq[Long]) = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory(s"sev_$name").toString
    val sin = spark.readStream.schema(schema).parquet(s"$dir/*")
    val q = twin(sin).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    val counts = Seq.newBuilder[Long]
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        spark.createDataFrame(chunk.asJava, schema)
          .coalesce(1).write.parquet(s"$dir/b$i")
        q.processAllAvailable()
        if (sys.props.contains("graft.sev.debug"))
          println(s"DBGSEV $name chunk $i: " + Option(q.lastProgress).map(p =>
            p.stateOperators.map(so =>
              s"${so.operatorName} total=${so.numRowsTotal} upd=${so.numRowsUpdated} rem=${so.numRowsRemoved}")
              .mkString("; ")).getOrElse("none"))
        counts += Option(q.lastProgress)
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
      }
      (spark.table(name), counts.result())
    } finally q.stop()
  }

  /** User 1 completes a journey at T0; user 2 repeats it 20 days later
    * (advancing the watermark far past user 1's 7-day horizon); a
    * third chunk gives the engine a batch in which to fire the
    * timeout. */
  private def chunks: Seq[Seq[Row]] = Seq(
    Seq(ev(1, 1, T0, "view"), ev(2, 1, T0 + Hour, "click"),
      ev(3, 1, T0 + 2 * Hour, "purchase")),
    Seq(ev(10, 2, T0 + 20 * Day, "view"), ev(11, 2, T0 + 20 * Day + Hour, "click"),
      ev(12, 2, T0 + 20 * Day + 2 * Hour, "purchase")),
    Seq(ev(13, 2, T0 + 20 * Day + 3 * Hour, "view")))

  test("attributionStream evicts idle keys; credits are untouched") {
    val (out, counts) = run("sev_attr", chunks,
      df => EventsStream.attributionStream(spark, df))
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // both users' purchases credit their own 2 touches 50/50 — nothing
    // lost to eviction (user 1's touches were out of every future
    // window before the key aged out)
    assert(got === Seq(
      (3L, 1L, "view", 50), (3L, 2L, "click", 50),
      (12L, 10L, "view", 50), (12L, 11L, "click", 50)))
    // after chunk 1: only user 1 in the store; chunk 3's batch runs
    // under a watermark ~20 days past user 1's horizon -> evicted,
    // only user 2 remains
    assert(counts.head === 1L, s"expected 1 state row after chunk 1, got $counts")
    assert(counts.last === 1L,
      s"idle key not evicted: state rows after final chunk = ${counts.last} ($counts)")
  }

  test("pathsStream evicts idle keys; trigrams are untouched on gap-free-per-horizon data") {
    val (out, counts) = run("sev_paths", chunks,
      df => EventsStream.pathsStream(spark, df))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(identity).toSeq
    assert(got === Seq((1L, "view>click>purchase"), (2L, "click>purchase>view"),
      (2L, "view>click>purchase")))
    assert(counts.head === 1L)
    assert(counts.last === 1L,
      s"idle key not evicted: state rows after final chunk = ${counts.last} ($counts)")
  }

  test("pathsStream with eviction disabled keeps every key (the unbounded form)") {
    val (_, counts) = run("sev_paths_off", chunks,
      df => EventsStream.pathsStream(spark, df, idleEvictUs = 0L))
    assert(counts.last === 2L,
      s"NoTimeout form should retain both keys, got ${counts.last} ($counts)")
  }

  test("sessionizeStream evicts idle keys; session ids intact on gap-free-per-horizon data") {
    val (out, counts) = run("sev_sess", chunks,
      df => EventsStream.sessionizeStream(spark, df))
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // each user's 3 events sit inside one 30-min... no — events are an
    // hour apart, so each event opens a NEW session (gap > 30 min):
    // sessions 0,1,2 per user; user 2's 4th event opens session 3
    assert(got === Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L),
      (10L, 2L, 0L), (11L, 2L, 1L), (12L, 2L, 2L), (13L, 2L, 3L)), s"got $got")
    assert(counts.head === 1L)
    assert(counts.last === 1L,
      s"idle key not evicted: state rows after final chunk = ${counts.last} ($counts)")
  }

  test("sessionizeStream with eviction disabled keeps every key") {
    val (_, counts) = run("sev_sess_off", chunks,
      df => EventsStream.sessionizeStream(spark, df, idleEvictUs = 0L))
    assert(counts.last === 2L,
      s"NoTimeout form should retain both keys, got ${counts.last} ($counts)")
  }

  test("sessionizeStream post-eviction return restarts numbering (the documented semantic)") {
    // user 1 returns 40 days after eviction: the batch twin would say
    // session 3 (counter continues); the evicted stream restarts at 0
    // — the scaladoc's conditional-parity contract, pinned so a future
    // change that silently alters it fails HERE with the semantics named
    val ret = chunks :+ Seq(ev(20, 1, T0 + 40 * Day, "view"))
    val (out, _) = run("sev_sess_ret", ret,
      df => EventsStream.sessionizeStream(spark, df))
    val u1 = out.collect().map(r => (r.getLong(0), r.getLong(2)))
      .filter(x => Seq(1L, 2L, 3L, 20L).contains(x._1)).sortBy(_._1).toSeq
    assert(u1 === Seq((1L, 0L), (2L, 1L), (3L, 2L), (20L, 0L)), s"got $u1")
  }

  test("dedupStream's seen-set is watermark-scoped: keys age out at the 10-min delay") {
    // each chunk inserts 3-4 (user, type) keys an hour apart; the
    // 10-minute watermark evicts a key as soon as the high-water mark
    // passes its event time + delay, so by each chunk's settling
    // batch only the NEWEST key survives — the store never holds the
    // stream's lifetime distinct keys (VERDICT r15 #2: the claimed
    // "grows with lifetime uniques" shape is exactly what this pins
    // against)
    val (out, counts) = run("sev_dedup", chunks,
      df => EventsStream.dedupStream(df))
    // each (user, type) pair is unique in the fixture: all rows emit
    assert(out.count() === 7L)
    assert(counts.forall(c => c >= 0L && c <= 4L),
      s"state exceeded the per-window bound: $counts")
    assert(counts.last <= 2L,
      s"seen-set not watermark-scoped: ${counts.last} rows ($counts)")
  }
}
