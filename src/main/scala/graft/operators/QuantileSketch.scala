package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
    * their partitions. */
  def sketch(df: DataFrame, valueCol: String, alpha: Double = 0.01): DD = {
    val s = df.sparkSession
    import s.implicits._
    val gamma = gammaFor(alpha)
    df.select(col(valueCol).cast("double")).as[Double]
      .mapPartitions(it => Iterator.single(foldValues(DD(0L, Map.empty), it, gamma)))
      .reduce((a, b) => a.merge(b))
  }

  /** Per-group sketches keyed by a string column: per-(partition ×
    * key) mutable folds emit one sketch each, so the shuffle carries
    * ≤ groups × partitions bucket maps — never rows — and
    * `reduceGroups` merges them with map-side partials. */
  def groupSketch(df: DataFrame, keyCol: String, valueCol: String,
      alpha: Double = 0.01): Map[String, DD] = {
    val s = df.sparkSession
    import s.implicits._
    val gamma = gammaFor(alpha)
    df.select(col(keyCol), col(valueCol).cast("double")).as[(String, Double)]
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
          k -> DD(zeros.getOrElse(k, 0L),
            hists.get(k).map(_.iterator.map { case (a, c) => a.toInt -> c }.toMap)
              .getOrElse(Map.empty))
        }
      }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, a._2.merge(b._2)))
      .map { case (k, (_, dd)) => (k, dd) }
      .collect().toMap
  }
}
