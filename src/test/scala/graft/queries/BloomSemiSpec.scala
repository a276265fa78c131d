package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomMightContain
import graft.sources.SparkTestSession

/** Pins the Bloom-prefiltered semi join (a12_bloom_semi) and the
  * native `BloomMightContain` probe expression:
  *  - no false negatives — every inserted key passes the probe, so the
  *    prefilter can never change the exact semi-join result;
  *  - interpreted eval == codegen'd eval (the expression is pure);
  *  - the prefilter actually prunes on the sf0.001 corpus (strictly
  *    fewer rows survive the probe than exist), while the final
  *    aggregate matches the plain, un-prefiltered semi join.
  */
class BloomSemiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("probe has no false negatives and codegen matches interpreted eval") {
    import spark.implicits._
    val keys = (0L until 5000L).map(_ * 7919L % 100003L)
    val keysDf = keys.toDF("k")
    val bloom = keysDf.stat.bloomFilter("k", 5000L, 0.01)

    // no false negatives: every inserted key probes true
    val surviving = keysDf.filter(BloomMightContain.probe(spark, col("k"), bloom)).count()
    assert(surviving === keys.distinct.length.toLong)

    // codegen vs interpreted: force both paths over a mixed member /
    // non-member range and compare row for row
    val mixed = (0L until 20000L).toDF("k")
    val viaCodegen = mixed.filter(BloomMightContain.probe(spark, col("k"), bloom))
      .collect().map(_.getLong(0)).toSet
    val viaEval = mixed.collect().map(_.getLong(0))
      .filter(bloom.mightContainLong).toSet
    assert(viaCodegen === viaEval)
  }

  // ADVICE r11: the expression must compare by filter CONTENT, not by
  // Broadcast reference identity, or canonicalization / common-
  // subexpression elimination can never dedupe two identical probes
  test("identical-content probes compare equal; different content do not") {
    import spark.implicits._
    import org.apache.spark.sql.GraftExpressionBridge
    val df = (0L until 100L).toDF("k")
    val b1 = df.stat.bloomFilter("k", 100L, 0.01)
    val b2 = df.stat.bloomFilter("k", 100L, 0.01) // same content, separate build
    val b3 = (0L until 101L).toDF("k").stat.bloomFilter("k", 101L, 0.01)
    // one shared child Column: pre-resolution col("k") instances carry
    // distinct call-site Origins, and the point here is the FILTER
    // term of the equality (children unify post-analysis via exprIds)
    val k = col("k")
    def expr(b: org.apache.spark.util.sketch.BloomFilter) =
      GraftExpressionBridge.expression(BloomMightContain.probe(spark, k, b))
    assert(expr(b1) == expr(b2), "content-identical probes must be equal")
    assert(expr(b1).hashCode == expr(b2).hashCode)
    assert(expr(b1) != expr(b3), "different filters must not compare equal")
  }

  test("a12_bloom_semi equals the plain semi join; the prefilter prunes") {
    val bloomed = graft.SparkEntry.queries("a12_bloom_semi")(spark, sf).collect()

    val sel = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000.0)
      .select("o_orderkey")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = li.join(sel, li("l_orderkey") === sel("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag").collect()

    assert(bloomed.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)

    // the probe must do real work: strictly fewer fact rows survive it
    // than the table holds, and at least the true matches survive
    val bloom = sel.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val total = li.count()
    val afterProbe =
      li.filter(BloomMightContain.probe(spark, col("l_orderkey"), bloom)).count()
    val trueMatches =
      li.join(sel, li("l_orderkey") === sel("o_orderkey"), "left_semi").count()
    assert(afterProbe < total, "prefilter pruned nothing")
    assert(afterProbe >= trueMatches, "prefilter lost true matches")
  }

  // the HLL sketch is spec-pinned here (NOT an oracle ledger row —
  // sketch values are implementation-specific, VERDICT r11 #2): its
  // own exact twin column must agree with the fully-oracled
  // a13_distinct_exact row, and the approx must stay inside the
  // published HLL++ error bound against it
  test("hllDistinct approx stays within 5x the configured rsd of exact") {
    val rows = RelationalOps.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val oracleExact = graft.SparkEntry.queries("a13_distinct_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact == oracleExact(r.getString(0)).toDouble,
        s"${r.getString(0)}: sketch row's exact twin diverges from a13_distinct_exact")
      assert(math.abs(approx - exact) <= 5 * 0.02 * exact,
        s"${r.getString(0)}: approx $approx vs exact $exact out of bound")
    }
  }

  test("a11_mode breaks count ties toward the lexicographically first type") {
    import spark.implicits._
    // drive the PRODUCTION query (not a local copy of its window) over
    // a synthetic events table with a deliberate tie:
    // user 1: click/view 2 each -> click wins; user 2: purchase ahead
    val dir = java.nio.file.Files.createTempDirectory("a11_tie").toString
    Seq(
      (1L, 1000L, 1L, "view", 0.0, "{}"),
      (2L, 2000L, 1L, "click", 0.0, "{}"),
      (3L, 3000L, 1L, "view", 0.0, "{}"),
      (4L, 4000L, 1L, "click", 0.0, "{}"),
      (5L, 1000L, 2L, "purchase", 0.0, "{}"),
      (6L, 2000L, 2L, "purchase", 0.0, "{}"),
      (7L, 3000L, 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val modes = graft.SparkEntry.queries("a11_mode")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(modes === Seq((1L, "click", 2L), (2L, "purchase", 2L)))
  }
}
