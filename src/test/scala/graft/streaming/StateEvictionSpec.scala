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
}
