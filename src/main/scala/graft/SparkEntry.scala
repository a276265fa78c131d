package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module operator surfaces:
  *  - [[RelationalOps]]: the generic relational inventory of SURVEY §2
  *    (scans, filters, joins, aggs, windows, sorts, reshape, topology)
  *    over the TPC-H-ish corpus, each with a DuckDB oracle.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ RelationalOps.analyticsQueries ++
      TextOps.queries ++ VectorOps.queries ++
      PipelineOps.queries ++ GraphOps.queries ++ SearchOps.queries ++ OsmQueries.queries ++ Map(
      "q1_agg" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy("l_returnflag")
          // decimal accumulation: exact, engine-order-independent
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("l_returnflag")
      })
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracle ++ RelationalOps.analyticsOracle ++
      TextOps.oracle ++ VectorOps.oracle ++
      PipelineOps.oracle ++ GraphOps.oracle ++ SearchOps.oracle ++ OsmQueries.oracle ++ Map(
      "q1_agg" -> "SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
}
