package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time selected queries in an isolated JVM (the headline
  * bench runs 40 queries in one JVM, where GC/codegen pollution from
  * neighbors can masquerade as a per-query regression).
  * sbt "runMain graft.TimeQuery <reps> <name> [name ...]" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
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
    val qs = SparkEntry.queries
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = qs(name)(spark, sfDir).count()
        println(f"[time] $name%-24s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
