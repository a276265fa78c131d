package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.multimodal.MultimodalOps

/** Streaming-capable event transforms (batch-checked against the
  * oracle; the identical transform runs under readStream in
  * EventsStreamSpec) and multimodal binary-column plumbing. */
object PipelineOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling 1h window aggregation (streaming-capable transform)
    "ev_window_agg" -> ((s, dir) =>
      EventsStream.windowedCounts(t(s, dir, "events"))
        .orderBy("window_start_s", "event_type")),

    // 30-minute-gap sessionization per user
    "ev_sessionize" -> ((s, dir) =>
      EventsStream.sessionize(t(s, dir, "events"))
        .orderBy("user_id", "event_id")),

    // multimodal: binary media column → batched mapPartitions feature
    // extraction (oracle covers the byte stats; the stubbed decode path
    // and fingerprint are pinned in MultimodalSpec)
    "mm_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(s, MultimodalOps.docsAsMedia(t(s, dir, "documents")))
        .select(col("id").as("doc_id"), col("n_bytes"), col("n_distinct_bytes"))
        .orderBy("doc_id")),

    // full feature row incl. entropy + FNV fingerprint (rows-only)
    "mm_features_full" -> ((s, dir) =>
      MultimodalOps.extractFeatures(s, MultimodalOps.docsAsMedia(t(s, dir, "documents")))
        .select(col("id").as("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
          round(col("entropy"), 6).as("entropy"), col("fingerprint"))
        .orderBy("doc_id"))
  )

  def oracle: Map[String, String] = Map(
    "ev_window_agg" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_s,
                event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start_s, event_type""",
    "ev_sessionize" ->
      """WITH g AS (
           SELECT event_id, user_id, ts,
                  epoch_ns(ts) - lag(epoch_ns(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         f AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN gap IS NULL OR gap > 1800000000000 THEN 1 ELSE 0 END AS ns
           FROM g)
         SELECT event_id, user_id,
                sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_id
         FROM f ORDER BY user_id, event_id""",
    "mm_features" ->
      """SELECT doc_id, strlen(text) AS n_bytes,
                len(list_distinct(string_split(text, ''))) AS n_distinct_bytes
         FROM documents ORDER BY doc_id"""
  )
}
