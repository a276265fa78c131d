package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (VERDICT r21 task 7): attribute the bench's JIT-compiler
  * load. Runs the given queries for `SPARK_GRAFT_BENCHONE_REPS` reps
  * each (default 3) in ONE fresh JVM — the honest basis for comparing
  * codegen configurations, since JIT churn accumulates across plans —
  * and prints per-row min wall/cpu plus the RUN-TOTAL wall, process
  * CPU, JIT-compiler seconds and codegen-class source-cache stats.
  * `SPARK_GRAFT_CONF="k=v;k=v"` applies session confs before anything
  * runs (e.g. spark.sql.codegen.hugeMethodLimit=8000 for the
  * fallback-to-interpreted A/B). Profiling tool only — never part of
  * the timed bench path. */
object JitProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCHONE_REPS", "3").toInt
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
    spark.sparkContext.setLogLevel("ERROR")
    ProbeRig.applyEnvConf(spark)
    val qs = SparkEntry.queries
    val names = args.filter(qs.contains).toSeq
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def jitMs: Long = {
      val b = java.lang.management.ManagementFactory.getCompilationMXBean
      if (b != null && b.isCompilationTimeMonitoringSupported) b.getTotalCompilationTime else -1L
    }
    val t0 = System.nanoTime(); val c0 = os.getProcessCpuTime; val j0 = jitMs
    names.foreach { name =>
      val walls = (1 to reps).map { _ =>
        val w0 = System.nanoTime()
        val n = qs(name)(spark, sfDir).count()
        ((System.nanoTime() - w0) / 1e9, n)
      }
      graft.operators.Checkpoints.unpersistUnpinned(spark)
      println(f"[jit] ${name}%-24s min=${walls.map(_._1).min}%6.2fs rows=${walls.head._2}")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (os.getProcessCpuTime - c0) / 1e9
    val jit = (jitMs - j0) / 1e3
    // the conf value rides inside a JSON string — escape it or a value
    // containing quotes/backslashes breaks the A/B record (review r22)
    val confEsc = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .replace("\\", "\\\\").replace("\"", "\\\"")
      .filterNot(_.isControl)
    println(f"""{"jitprobe":{"n_rows":${names.size},"reps":$reps,"wall_s":$wall%.2f,"cpu_s":$cpu%.2f,"jit_s":$jit%.2f,"conf":"$confEsc"}}""")
    spark.stop()
  }
}
