package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, isnan}

/** DDSketch (Masson, Lee & Rim, VLDB 2019): a mergeable quantile
  * sketch with a RELATIVE-error guarantee that is fully DETERMINISTIC
  * and merge-order independent. Unlike KLL or t-digest, whose
  * compactions depend on arrival/merge order, DDSketch's state is a
  * pure bucket→count histogram on the fixed grid
  * `bucket(x) = ceil(ln x / ln γ)`, γ = (1+α)/(1−α) — so ANY
  * partitioning or merge tree over the same data yields the identical
  * sketch (QuantileSketchSpec pins it across repartitionings).
  *
  * Guarantee: the q-quantile estimate v̂ satisfies |v̂ − v_q| ≤ α·v_q
  * (relative VALUE error; KLL's guarantee is rank error — different
  * contract, each right for different monitoring). Domain:
  * non-negative values plus a dedicated zero bucket — the corpus
  * columns this serves (prices, event values, token counts,
  * latencies) are non-negative.
  *
  * Scale (100 TB): the sketch size is logarithmic in DYNAMIC RANGE
  * and independent of row count — range 10^5 at α = 0.01 is ~575
  * buckets, broadcastable — and both entry points fold rows through
  * a per-partition MUTABLE histogram (no per-row persistent-map
  * allocation on the hot path) and only ship per-(partition × group)
  * sketches through the shuffle, never rows.
  *
  * No DuckDB oracle by design (the HLL-sketch pattern,
  * a13_distinct_exact): bucketing uses the JVM's `ln`, which has no
  * cross-engine bit contract; correctness is pinned against the
  * ORACLED exact twin (a10_percentile's `percentile()`) via the α
  * bound in QuantileSketchSpec.
  */
object QuantileSketch extends Serializable {

  /** The sketch state: zero-value count + positive-bucket histogram. */
  final case class DD(zeros: Long, counts: Map[Int, Long]) {
    def n: Long = zeros + counts.valuesIterator.sum
    def merge(o: DD): DD = DD(zeros + o.zeros,
      o.counts.foldLeft(counts) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      })
  }

  /** THE shared domain predicate of every entry point, batch and
    * stream: finite, non-null, non-negative. One rule, applied at the
    * DataFrame boundary, so batch/stream comparisons never depend on a
    * caller remembering it (ADVICE r14 #3 — `.as[Double]` on a null
    * throws, and a monitoring path must drop a bad record, not die).
    * NOTE `c >= 0` ALONE keeps NaN: Spark SQL orders NaN greater than
    * every double, so the explicit `!isnan` is load-bearing. */
  private[graft] def inDomain(c: Column): Column =
    c.isNotNull && !isnan(c) && (c >= 0)

  /** Lowest-bucket collapse (the paper's bounded-memory variant):
    * while the histogram exceeds `maxBuckets`, merge the two LOWEST
    * buckets — equivalently, fold all mass below the maxBuckets-th
    * highest key into that key. Values in the collapsed region are
    * over-estimated (up to the collapse floor's upper bound), so the
    * α guarantee is kept EXACTLY for every quantile whose rank falls
    * at or above the collapsed mass — the high quantiles a bounded
    * monitoring sketch exists to serve — and the worst low-quantile
    * answer is the collapse floor itself, never garbage.
    *
    * Determinism is PRESERVED: collapse pushes mass UP toward the
    * m-th highest key, and the m-th highest key of a merged sketch is
    * ≥ that of each input, so collapsing after every fold/merge or
    * once at the end yields the identical final sketch (the
    * QuantileSketchSpec partitioning test runs with the cap on).
    * `maxBuckets <= 0` disables (the exact-histogram default; the
    * corpus columns need ~575 buckets at α = 0.01 — the cap is armor
    * for adversarial dynamic range, e.g. a stream mixing µs latencies
    * with byte counts). */
  def collapse(s: DD, maxBuckets: Int): DD = {
    if (maxBuckets <= 0 || s.counts.size <= maxBuckets) s
    else {
      val keysDesc = s.counts.keysIterator.toArray.sortInPlace().reverse
      val floor = keysDesc(maxBuckets - 1)
      var low = 0L
      val kept = Map.newBuilder[Int, Long]
      s.counts.foreach { case (k, v) =>
        if (k < floor) low += v
        else if (k > floor) kept += (k -> v)
      }
      kept += (floor -> (s.counts(floor) + low))
      DD(s.zeros, kept.result())
    }
  }

  def gammaFor(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    (1 + alpha) / (1 - alpha)
  }

  /** Fixed-grid bucket of a positive value: x ∈ (γ^(i−1), γ^i] → i. */
  def bucket(x: Double, gamma: Double): Int =
    math.ceil(math.log(x) / math.log(gamma)).toInt

  def add(s: DD, x: Double, gamma: Double): DD = {
    require(x >= 0, s"DDSketch domain is non-negative, got $x")
    if (x == 0.0) s.copy(zeros = s.zeros + 1)
    else {
      val b = bucket(x, gamma)
      s.copy(counts = s.counts.updated(b, s.counts.getOrElse(b, 0L) + 1L))
    }
  }

  /** Fold a whole value stream into `base` through ONE mutable
    * histogram, building the immutable DD once at the end — the
    * hot-path form (review r14: per-row immutable `Map.updated`
    * allocates a persistent-map spine per input row; at 100 TB that
    * is pure GC pressure for buffer-private state). Semantically
    * identical to folding [[add]] per row. */
  private[graft] def foldValues(base: DD, it: Iterator[Double],
      gamma: Double): DD = {
    var zeros = 0L
    val m = scala.collection.mutable.LongMap.empty[Long]
    it.foreach { x =>
      require(x >= 0, s"DDSketch domain is non-negative, got $x")
      if (x == 0.0) zeros += 1
      else {
        val b = bucket(x, gamma).toLong
        m.update(b, m.getOrElse(b, 0L) + 1L)
      }
    }
    base.merge(DD(zeros, m.iterator.map { case (k, v) => k.toInt -> v }.toMap))
  }

  /** q-quantile estimate (q ∈ [0, 1]): the value at rank
    * floor(q·(n−1)), each positive bucket i estimated at its
    * γ-midpoint 2γ^i/(γ+1) — the paper's bound-attaining choice. */
  def quantile(s: DD, q: Double, gamma: Double): Double = {
    require(s.n > 0, "quantile of an empty sketch")
    require(q >= 0 && q <= 1, s"q in [0,1], got $q")
    val rank = math.floor(q * (s.n - 1)).toLong
    if (rank < s.zeros) 0.0
    else {
      var acc = s.zeros
      var out = 0.0
      val it = s.counts.toSeq.sortBy(_._1).iterator
      var found = false
      while (it.hasNext && !found) {
        val (i, c) = it.next()
        acc += c
        if (acc > rank) { out = 2.0 * math.pow(gamma, i) / (gamma + 1); found = true }
      }
      out
    }
  }

  /** Global sketch of a numeric column: one mutable-histogram fold
    * per partition (narrow), then a merge of the per-partition
    * sketches — the shuffle-free treeable form; the rows never leave
    * their partitions. Out-of-domain values (null / NaN / negative)
    * are dropped at the boundary by [[inDomain]] — the same rule the
    * streaming twin applies, so batch and stream always sketch the
    * same value set. `maxBuckets > 0` arms the [[collapse]] bound
    * (applied per partition fold AND per merge, which the collapse
    * determinism argument makes equivalent to one final pass). */
  def sketch(df: DataFrame, valueCol: String, alpha: Double = 0.01,
      maxBuckets: Int = 0): DD = {
    val s = df.sparkSession
    import s.implicits._
    val gamma = gammaFor(alpha)
    df.select(col(valueCol).cast("double").as("v"))
      .filter(inDomain(col("v"))).as[Double]
      .mapPartitions(it => Iterator.single(
        collapse(foldValues(DD(0L, Map.empty), it, gamma), maxBuckets)))
      .reduce((a, b) => collapse(a.merge(b), maxBuckets))
  }

  /** Per-group sketches keyed by a string column: per-(partition ×
    * key) mutable folds emit one sketch each, so the shuffle carries
    * ≤ groups × partitions bucket maps — never rows — and
    * `reduceGroups` merges them with map-side partials. Domain and
    * bucket-bound rules are [[sketch]]'s. */
  def groupSketch(df: DataFrame, keyCol: String, valueCol: String,
      alpha: Double = 0.01, maxBuckets: Int = 0): Map[String, DD] = {
    val s = df.sparkSession
    import s.implicits._
    val gamma = gammaFor(alpha)
    df.select(col(keyCol), col(valueCol).cast("double").as("v"))
      .filter(inDomain(col("v"))).as[(String, Double)]
      .mapPartitions { it =>
        val zeros = scala.collection.mutable.HashMap.empty[String, Long]
        val hists = scala.collection.mutable
          .HashMap.empty[String, scala.collection.mutable.LongMap[Long]]
        it.foreach { case (k, x) =>
          require(x >= 0, s"DDSketch domain is non-negative, got $x")
          if (x == 0.0) zeros.update(k, zeros.getOrElse(k, 0L) + 1L)
          else {
            val m = hists.getOrElseUpdate(k,
              scala.collection.mutable.LongMap.empty[Long])
            val b = bucket(x, gamma).toLong
            m.update(b, m.getOrElse(b, 0L) + 1L)
          }
        }
        (zeros.keySet ++ hists.keySet).iterator.map { k =>
          k -> collapse(DD(zeros.getOrElse(k, 0L),
            hists.get(k).map(_.iterator.map { case (a, c) => a.toInt -> c }.toMap)
              .getOrElse(Map.empty)), maxBuckets)
        }
      }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, collapse(a._2.merge(b._2), maxBuckets)))
      .map { case (k, (_, dd)) => (k, dd) }
      .collect().toMap
  }
}
