package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility: per-STAGE cost breakdown for a query. TimeQuery's
  * end-to-end wall/CPU can't attribute cost inside a multi-job plan
  * (lazy localCheckpoint materializations each run as their own job,
  * invisible to final-plan metrics); a stage listener sees every stage
  * with its callsite, executor CPU and shuffle volume.
  * sbt "runMain graft.PlanMetrics osm_big_buildings" */
object PlanMetrics {

  final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long, shuffleReadMB: Double,
      shuffleWriteMB: Double, inputMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ProbeRig.applyEnvConf(spark)

    val rows = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    @volatile var record = false
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = ev.stageInfo
          val m = si.taskMetrics
          // the stage "name" is an anonymous SQL-execution callsite;
          // the RDD lineage scopes/callsites inside the stage are what
          // identify it (scan, explode, mapPartitions walk, ...)
          val ops = si.rddInfos.sortBy(_.id).map { r =>
            val scope = r.scope.map(_.name).getOrElse("")
            if (scope.nonEmpty) scope else r.name
          }.distinct.mkString(" > ")
          rows += StageRow(si.stageId, ops.take(120), si.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.toSeq.foreach { name =>
      println(s"\n========== $name ==========")
      // warmup rep: JIT + codegen, excluded from the recorded breakdown
      SparkEntry.queries(name)(spark, sfDir).count()
      graft.operators.Checkpoints.unpersistUnpinned(spark, blocking = true)
      rows.clear()
      record = true
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      record = false
      Thread.sleep(500) // let the listener bus drain the last stage events
      println(s"rows=$n")
      println(f"${"stage"}%-6s${"tasks"}%-7s${"run_s"}%-8s${"cpu_s"}%-8s${"gc_s"}%-7s${"shRd_MB"}%-9s${"shWr_MB"}%-9s${"in_MB"}%-8s name")
      rows.sortBy(-_.runMs).foreach { r =>
        println(f"${r.id}%-6d${r.tasks}%-7d${r.runMs / 1000.0}%-8.2f${r.cpuMs / 1000.0}%-8.2f${r.gcMs / 1000.0}%-7.2f${r.shuffleReadMB}%-9.1f${r.shuffleWriteMB}%-9.1f${r.inputMB}%-8.1f${r.name}")
      }
      val totCpu = rows.map(_.cpuMs).sum / 1000.0
      val totRun = rows.map(_.runMs).sum / 1000.0
      println(f"TOTAL executor run=$totRun%.2f s cpu=$totCpu%.2f s over ${rows.size} stages")
      graft.operators.Checkpoints.unpersistUnpinned(spark, blocking = true)
    }
    spark.stop()
  }
}
