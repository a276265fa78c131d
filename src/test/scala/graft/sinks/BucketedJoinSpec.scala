package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the bucketed-sink join contract: two tables landed via
  * BucketedSink on the same key with the same bucket count equi-join
  * with NO Exchange on either side (the scan's bucket layout IS the
  * join partitioning), and the join result is byte-identical to the
  * plain parquet join. Broadcast is disabled for the plan check so the
  * shuffle-free claim is about the sort-merge path a 100 TB fact-to-
  * fact join would take, not a small-side broadcast. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("same-key bucketed tables join without any Exchange and match the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    BucketedSink.writeBucketed(li, "b_lineitem", s"$dir/li", "l_orderkey", 8)
    BucketedSink.writeBucketed(o, "b_orders", s"$dir/o", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join planned a shuffle — co-location lost:\n$plan")

      val got = joined
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
      assert(got === expected, "bucketed join result diverged from plain join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("aggregation on the bucket key needs no exchange before the partial agg") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed_agg").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    BucketedSink.writeBucketed(li, "b_li_agg", s"$dir/li", "l_orderkey", 8)
    try {
      val agg = spark.table("b_li_agg")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key planned a shuffle:\n$plan")
      val got = agg.orderBy("l_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected)
    } finally spark.sql("DROP TABLE IF EXISTS b_li_agg")
  }
}
