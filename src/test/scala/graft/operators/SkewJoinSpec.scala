package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SparkTestSession

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted inner join equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val left = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong else 7L, s"payload$i"))
      .toDF("k", "payload")
    val right = Seq((7L, "hot"), (20L, "cold"), (1000L, "cold2"))
      .toDF("rk", "tag")

    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInner(left, right, "k", "rk", salts = 8)
      .select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted === plain)
    // 9000 hot-key rows + k=20 + k=1000
    assert(plain.length === 9002)
  }

  test("salt actually spreads the hot key across sub-keys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (7L, i)).toDF("k", "v")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected hot key spread over ~8 salts, got $salts")
  }
}
