package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Engine-side invariants of the PageRank operator that the value
  * oracle cannot see failing gradually: mass conservation (the scaled
  * formulation's ranks sum to the node count after every damped
  * iteration — a wrong degree, a dropped dangling edge, or a
  * mis-quantized contribution all leak mass) and the symmetric-graph
  * sanity that a higher-degree hub outranks a leaf. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("scaled pagerank conserves mass: sum(pr) == node count (±quantization)") {
    val rows = GraphOps.pagerank(spark, sf, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = rows.length
    val mass = rows.map(_._2).sum
    // each of 3 iterations quantizes per-edge contributions to 2^-20:
    // worst-case drift is edges × 2^-20 per iteration — far below 0.01
    assert(math.abs(mass - n) < 0.01 * n / 100 + 0.5,
      s"mass not conserved: sum=$mass over $n nodes")
    assert(rows.map(_._1).distinct.length === n, "duplicate node rows")
  }

  test("a hub node outranks a leaf on a synthetic star") {
    import spark.implicits._
    // star: supplier 1 serves every customer; supplier 2 serves one
    val dir = java.nio.file.Files.createTempDirectory("pr_star").toString
    val orders = (1L to 20L).map(c => (c, c)) // orderkey = custkey
    orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    val li = (1L to 20L).map(o => (o, if (o == 1L) 2L else 1L))
    li.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val pr = GraphOps.pagerank(spark, dir, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hub = pr(1L * 2 + 1) // supplier 1 (odd-coded)
    val leaf = pr(2L * 2 + 1) // supplier 2
    assert(hub > leaf * 3,
      s"hub supplier not dominant: hub=$hub leaf=$leaf")
  }
}
