package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Restart armor for the stateful streaming twins: MicroBatchSplitSpec
  * proves invariance to WHERE the batch boundaries fall; this spec
  * proves the state itself survives a full query STOP + RESTART from
  * the checkpoint — the production crash/upgrade path. The stream is
  * fed in two halves with the query torn down in between (same
  * checkpoint dir, fresh query object, durable parquet sink — a memory
  * sink would lose the first half's rows on restart). The union of
  * both runs' outputs must equal the batch twin over the whole data,
  * which fails if GroupState is lost, double-counted, or replayed. */
class CheckpointRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixtureDir = "/root/testdata/sf0.001"

  test("asofStream survives a stop/restart from checkpoint mid-stream") {
    val df = spark.read.parquet(s"$fixtureDir/events.parquet")
    val rows = df.withColumn("__us", EventTime.tsUs(df))
      .orderBy("__us", "event_id").drop("__us").collect()
    val schema = df.schema
    val half = rows.length / 2

    val base = java.nio.file.Files.createTempDirectory("ckpt_restart").toString
    val srcDir = s"$base/src"
    val sinkDir = s"$base/sink"
    val ckptDir = s"$base/ckpt"

    import scala.jdk.CollectionConverters._
    def feed(name: String, chunk: Seq[Row]): Unit =
      spark.createDataFrame(chunk.asJava, schema)
        .coalesce(1).write.parquet(s"$srcDir/$name")

    def runOnce(): Unit = {
      val sin = spark.readStream.schema(schema).parquet(s"$srcDir/*")
      val q = EventsStream.asofStream(spark, sin)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .format("parquet").option("path", sinkDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    feed("b0", rows.take(half).toSeq)
    runOnce() // first run commits state for the first half, then STOPS
    feed("b1", rows.drop(half).toSeq)
    runOnce() // fresh query object, same checkpoint: state must resume

    val got = spark.read.parquet(sinkDir)
      .orderBy("click_id").collect().map(_.toSeq).toSeq
    val expected = graft.queries.PipelineOps.queries("ev_asof_join")(spark, fixtureDir)
      .select(col("click_id"), col("user_id"), col("view_id"), col("gap_us"))
      .orderBy("click_id").collect().map(_.toSeq).toSeq
    assert(got === expected,
      "restarted stream diverged from batch — state lost or replayed across restart")
    assert(got.nonEmpty)
  }
}
