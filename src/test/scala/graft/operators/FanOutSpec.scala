package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins FanOut's no-op-at-scale rule (VERDICT r21 "zero new tests for
  * this round's machinery"): the conditional repartition fires exactly
  * when the planned input has fewer partitions than the session's
  * default parallelism, is an identity otherwise (the 100 TB case —
  * thousands of scan splits), honors the kill-switch, and hash-
  * partitions when keys are given. */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("repartitions a starved input to default parallelism") {
    val target = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 1000).coalesce(1).toDF("id")
    assert(one.rdd.getNumPartitions === 1)
    val fanned = FanOut(one)
    assert(fanned.rdd.getNumPartitions === target)
    assert(fanned.count() === 1000L)
  }

  test("no-op when the input already feeds the cores (the at-scale case)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).repartition(target * 2).toDF("id")
    val out = FanOut(wide)
    // identity, not a new exchange: the SAME DataFrame comes back
    assert(out eq wide, "FanOut must be an identity at scan parallelism >= cores")
    val exact = spark.range(0, 1000).repartition(target).toDF("id")
    assert(FanOut(exact) eq exact, "equal partition count is already enough")
  }

  test("kill-switch disables the exchange") {
    spark.conf.set(FanOut.ConfKey, "false")
    try {
      val one = spark.range(0, 10).coalesce(1).toDF("id")
      assert(FanOut(one) eq one)
    } finally spark.conf.unset(FanOut.ConfKey)
  }

  test("keys hash-partition deterministically") {
    import org.apache.spark.sql.functions.col
    val target = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 1000).coalesce(1).toDF("id")
    val fanned = FanOut(one, col("id"))
    assert(fanned.rdd.getNumPartitions === target)
    // same key -> same partition across two executions (deterministic
    // under retry, unlike a rand-derived key)
    import spark.implicits._
    def placement() = fanned
      .select(col("id"), org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .as[(Long, Int)].collect().toMap
    assert(placement() === placement())
  }
}
