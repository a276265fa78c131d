package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming-capable event transforms. The reference is
  * strictly batch (SURVEY §2.9); this module adds the streaming surface
  * a large-scale pipeline needs: the same logical transform runs over a
  * batch DataFrame (for the DuckDB oracle) and a readStream source
  * (proven in EventsStreamSpec with a memory sink).
  *
  * `ts` arrives as raw nanosecond longs (see Verify session config).
  */
object EventsStream {

  /** Tumbling 1-hour windowed aggregation — watermark + window on the
    * event time; in batch mode the watermark is a no-op and results
    * match the oracle's epoch-bucket arithmetic exactly. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_seconds(col("w.start")).as("window_start_s"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session ids per user: a new session when the gap to the previous
    * event exceeds 30 minutes (batch form; the streaming form would use
    * flatMapGroupsWithState — same per-user sequential semantics). */
  def sessionize(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapNs = 30L * 60 * 1000000000L
    events
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > gapNs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum) - 1)
      .select("event_id", "user_id", "session_id")
  }
}
