package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.SparkTestSession

/** Property check for the bounded-heap per-query top-k: on random
  * scored tables (with deliberate score ties), rankTopK must equal the
  * naive global window (sim desc, match_id asc) row for row — the heap
  * pre-prune is only a physical optimization. */
class RankTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rankTopK == naive window on random inputs with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val rows = for {
        q <- 0L until 4L
        m <- 0L until (50 + trial * 37).toLong
      } yield (q, m + q * 1000,
        // coarse grid forces plenty of exact ties
        math.floor(rnd.nextDouble() * 20) / 20.0)
      val scored = rows.toDF("query_id", "match_id", "sim").repartition(7)

      val fast = VectorOps.rankTopK(scored, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("match_id").asc)
      val naive = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select("query_id", "match_id", "sim", "rk")
        .orderBy("query_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

      assert(fast.toSeq === naive.toSeq, s"trial $trial diverged")
    }
  }
}
