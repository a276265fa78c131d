package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import java.sql.Timestamp

/** Pins ev_funnel's ordering semantics: steps must be STRICTLY later
  * in µs (equal-µs never advances), pre-view clicks are ignored, and
  * the walk is greedy-first per stage. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("funnel").toString
    import spark.implicits._
    def ts(us: Long) = new Timestamp(us / 1000).toInstant
      .plusNanos((us % 1000) * 1000)
    val rows = Seq(
      // user 1: click BEFORE view (ignored), then full funnel
      (10L, ts(1000L), 1L, "click", 0.0, "{}"),
      (11L, ts(2000L), 1L, "view", 0.0, "{}"),
      (12L, ts(3000L), 1L, "click", 0.0, "{}"),
      (13L, ts(4000L), 1L, "purchase", 0.0, "{}"),
      // user 2: click at the SAME µs as the view -> stage stays 1
      (20L, ts(5000L), 2L, "view", 0.0, "{}"),
      (21L, ts(5000L), 2L, "click", 0.0, "{}"),
      // user 3: purchase before any click -> stage 1
      (30L, ts(6000L), 3L, "view", 0.0, "{}"),
      (31L, ts(7000L), 3L, "purchase", 0.0, "{}"),
      // user 4: no view at all -> stage 0
      (40L, ts(8000L), 4L, "click", 0.0, "{}"))
    rows.map { case (id, t, u, tp, v, p) =>
      (id, java.sql.Timestamp.from(t), u, tp, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("strict-after ordering, pre-view clicks ignored") {
    val rows = PipelineOps.queries("ev_funnel")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toMap
    assert(rows(1L) === ((3, Some(2000L), Some(3000L), Some(4000L))))
    assert(rows(2L) === ((1, Some(5000L), None, None)))
    assert(rows(3L) === ((1, Some(6000L), None, None)))
    assert(rows(4L) === ((0, None, None, None)))
  }
}
