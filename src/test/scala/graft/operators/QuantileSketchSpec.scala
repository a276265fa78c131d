package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** DDSketch contracts: merge-order/partitioning determinism (the
  * property KLL/t-digest cannot give), mergeability, the α
  * relative-error bound against the ORACLED exact percentile (the
  * a13 sketch-vs-exact-twin pattern), and the bucket-count scale
  * claim. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private val Alpha = 0.01
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("identical sketch under any partitioning and input order") {
    val base = QuantileSketch.sketch(li, "l_extendedprice", Alpha)
    val repart = QuantileSketch.sketch(li.repartition(13), "l_extendedprice", Alpha)
    val sorted = QuantileSketch.sketch(
      li.orderBy(col("l_extendedprice").desc), "l_extendedprice", Alpha)
    val single = QuantileSketch.sketch(li.coalesce(1), "l_extendedprice", Alpha)
    assert(base === repart)
    assert(base === sorted)
    assert(base === single)
  }

  test("mergeability: sketch(A) ++ sketch(B) == sketch(A ∪ B)") {
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
    val merged = QuantileSketch.sketch(a, "l_extendedprice", Alpha)
      .merge(QuantileSketch.sketch(b, "l_extendedprice", Alpha))
    assert(merged === QuantileSketch.sketch(li, "l_extendedprice", Alpha))
  }

  test("alpha relative-error bound vs exact percentile on l_extendedprice") {
    val gamma = QuantileSketch.gammaFor(Alpha)
    val dd = QuantileSketch.sketch(li, "l_extendedprice", Alpha)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)
    val exact = li.select(
      qs.map(q => expr(s"percentile(l_extendedprice, $q)").as(s"q$q")): _*)
      .head()
    qs.zipWithIndex.foreach { case (q, i) =>
      val est = QuantileSketch.quantile(dd, q, gamma)
      val ex = exact.getDouble(i)
      assert(math.abs(est - ex) <= Alpha * ex * 1.0001,
        s"q=$q: |$est - $ex| exceeds alpha bound ${Alpha * ex}")
    }
  }

  test("grouped sketches track the exact grouped percentiles (a10's shape)") {
    val gamma = QuantileSketch.gammaFor(Alpha)
    val sk = QuantileSketch.groupSketch(li, "l_returnflag", "l_quantity", Alpha)
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(sk.keySet === exact.keySet)
    sk.foreach { case (k, dd) =>
      val (p50, p95) = exact(k)
      assert(math.abs(QuantileSketch.quantile(dd, 0.5, gamma) - p50) <= Alpha * p50 * 1.0001)
      assert(math.abs(QuantileSketch.quantile(dd, 0.95, gamma) - p95) <= Alpha * p95 * 1.0001)
    }
  }

  test("sketch size is logarithmic in dynamic range, independent of row count") {
    val dd = QuantileSketch.sketch(li, "l_extendedprice", Alpha)
    val mm = li.agg(min("l_extendedprice"), max("l_extendedprice")).head()
    val bound = math.log(mm.getDouble(1) / mm.getDouble(0)) /
      math.log(QuantileSketch.gammaFor(Alpha)) + 2
    assert(dd.counts.size <= bound,
      s"${dd.counts.size} buckets > log-range bound $bound")
    assert(dd.n === li.count())
  }

  test("out-of-domain values (null / NaN / negative) are dropped, not thrown") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, Double.NaN, -5.0, 100.0, 0.0)
      .toDF("v")
    val dd = QuantileSketch.sketch(df, "v", Alpha)
    // only 1.0, 100.0 and the zero survive the shared domain rule
    assert(dd.n === 3L)
    assert(dd.zeros === 1L)
    val grouped = QuantileSketch.groupSketch(
      Seq(("a", java.lang.Double.valueOf(2.0)), ("a", null),
        ("b", java.lang.Double.valueOf(Double.NaN)),
        ("b", java.lang.Double.valueOf(-1.0))).toDF("k", "v"), "k", "v", Alpha)
    assert(grouped("a").n === 1L)
    // b's rows are all out-of-domain -> the key vanishes entirely
    assert(!grouped.contains("b"))
  }

  test("collapse bounds buckets; high-quantile alpha bound survives") {
    val gamma = QuantileSketch.gammaFor(Alpha)
    val MaxB = 64
    val dd = QuantileSketch.sketch(li, "l_extendedprice", Alpha, MaxB)
    assert(dd.counts.size <= MaxB, s"${dd.counts.size} buckets > cap $MaxB")
    assert(dd.n === QuantileSketch.sketch(li, "l_extendedprice", Alpha).n)
    // the uncapped sketch needs ~2x the cap here, so low buckets WERE
    // collapsed — and every quantile whose rank clears the collapsed
    // mass still meets the alpha bound vs the exact percentile
    val uncapped = QuantileSketch.sketch(li, "l_extendedprice", Alpha)
    assert(uncapped.counts.size > MaxB, "fixture no longer exercises collapse")
    val floor = dd.counts.keysIterator.min
    val collapsedMass = dd.counts(floor)
    val qs = Seq(0.5, 0.75, 0.95, 0.99).filter { q =>
      math.floor(q * (dd.n - 1)) >= collapsedMass + dd.zeros
    }
    assert(qs.nonEmpty, "no quantile clears the collapsed region — widen MaxB")
    val exact = li.select(
      qs.map(q => expr(s"percentile(l_extendedprice, $q)").as(s"q$q")): _*)
      .head()
    qs.zipWithIndex.foreach { case (q, i) =>
      val est = QuantileSketch.quantile(dd, q, gamma)
      val ex = exact.getDouble(i)
      assert(math.abs(est - ex) <= Alpha * ex * 1.0001,
        s"capped q=$q: |$est - $ex| exceeds alpha bound")
    }
  }

  test("collapse determinism: any partitioning/merge order, same capped sketch") {
    val MaxB = 64
    val base = QuantileSketch.sketch(li, "l_extendedprice", Alpha, MaxB)
    val repart = QuantileSketch.sketch(li.repartition(13), "l_extendedprice", Alpha, MaxB)
    val single = QuantileSketch.sketch(li.coalesce(1), "l_extendedprice", Alpha, MaxB)
    assert(base === repart)
    assert(base === single)
    // collapsing per-merge == collapsing the exact sketch once at the end
    val exact = QuantileSketch.sketch(li, "l_extendedprice", Alpha)
    assert(base === QuantileSketch.collapse(exact, MaxB))
  }

  test("zero handling and the zero bucket's quantile") {
    val gamma = QuantileSketch.gammaFor(Alpha)
    var dd = QuantileSketch.DD(0L, Map.empty)
    (1 to 10).foreach(_ => dd = QuantileSketch.add(dd, 0.0, gamma))
    (1 to 10).foreach(i => dd = QuantileSketch.add(dd, i * 100.0, gamma))
    assert(dd.zeros === 10L)
    assert(QuantileSketch.quantile(dd, 0.25, gamma) === 0.0)
    // rank floor(0.99 · 19) = 18 → the 19th of the 20 sorted values = 900
    val p99 = QuantileSketch.quantile(dd, 0.99, gamma)
    assert(math.abs(p99 - 900.0) <= Alpha * 900.0 * 1.0001)
    val p100 = QuantileSketch.quantile(dd, 1.0, gamma)
    assert(math.abs(p100 - 1000.0) <= Alpha * 1000.0 * 1.0001)
    intercept[IllegalArgumentException] {
      QuantileSketch.add(dd, -1.0, gamma)
    }
  }
}
