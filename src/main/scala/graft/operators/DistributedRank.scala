package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact complete-order rank per key WITHOUT a per-key single-task
  * window — the scale-safe form of `rank()/percent_rank()/ntile()
  * OVER (PARTITION BY low-cardinality-key ORDER BY complete-order)`.
  *
  * The classic window funnels each key's ENTIRE row set through one
  * task (a full sort on a ~3-value key at 100 TB is the textbook
  * scale-killer — VERDICT r11 §What's wrong #1/#2). This operator
  * computes the IDENTICAL integer rank with every stage partitioned:
  *
  *   1. range-repartition on (keys ++ order) — each key's rows are
  *      split across many partitions, globally ordered across
  *      partition ids (Spark's RangePartitioner; the same machinery
  *      behind a distributed ORDER BY);
  *   2. stamp `spark_partition_id()` and lazily localCheckpoint, so
  *      the expensive range exchange executes exactly once even
  *      though two branches consume it (the repo's shared-stage
  *      doctrine, PipelineOps `pipe_clean_corpus`);
  *   3. per-(partition, key) row counts — a tiny aggregate of at most
  *      P×K rows;
  *   4. each partition's PRIOR per-key count (rows of the same key in
  *      lower-numbered range partitions) via a bounded explode over
  *      the count table — deliberately NOT a cumulative window (that
  *      would reintroduce an `Exchange SinglePartition` for empty
  *      keys, the very shape PlanLint pins against) and NOT a theta
  *      join (BroadcastNestedLoopJoin is lint-forbidden);
  *   5. broadcast the prior/total counts back and add a row_number
  *      windowed by (partition-id, key) — partitioned by construction,
  *      each window group is at most one range partition's share.
  *
  * global rank = prior + local row_number. Exactness: the range
  * partitions are disjoint, totally ordered slices of the complete
  * (keys, order) order, so local rank offset by the prior count is
  * the global rank — pure integer arithmetic, cross-engine exact,
  * bit-identical to the single-task window form.
  */
object DistributedRank {

  /** Adds `grank` (1-based rank of the row within its key under the
    * complete ascending `order`) and `gcount` (total rows of the key)
    * to `df`. `order` must be a COMPLETE order (no ties) within each
    * key or ranks are nondeterministic — same contract as the window
    * form it replaces. `keys` may be empty for a global rank.
    */
  def withRank(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // constant key so the no-keys (global) case still joins through a
    // broadcast HASH join (an on-true join of a 1-row side would plan
    // as BroadcastNestedLoopJoin, which PlanLint forbids)
    val k = if (keys.nonEmpty) keys else Seq("__gk")
    val base = if (keys.nonEmpty) df else df.withColumn("__gk", lit(0))
    val partCols = k.map(col) ++ order
    val parted = base
      .repartitionByRange(p, partCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val counts = parted.groupBy((col("__pid") +: k.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"))
    // prior(pid, key) = Σ counts of the key in range partitions < pid:
    // every (pid, key, cnt) row contributes cnt to all higher pids —
    // ≤ P rows each over a ≤ P×K table, bounded by partitioning not
    // data volume
    val prior = counts
      .filter(col("__pid") < lit(p - 1))
      .withColumn("__tpid",
        explode(sequence(col("__pid") + 1, lit(p - 1), lit(1))))
      .groupBy((col("__tpid").as("__pid") +: k.map(col)): _*)
      .agg(sum(col("__cnt")).as("__prior"))
    val totals = counts.groupBy(k.map(col): _*)
      .agg(sum(col("__cnt")).as("gcount"))
    val w = Window.partitionBy(("__pid" +: k).map(col): _*).orderBy(order: _*)
    parted
      .join(broadcast(prior), ("__pid" +: k), "left")
      .join(broadcast(totals), k)
      .withColumn("grank",
        coalesce(col("__prior"), lit(0L)) + row_number().over(w))
      .drop("__pid", "__prior", "__gk")
  }

  /** percent_rank twin: `pr` = (grank−1)/(gcount−1) in double — the
    * exact arithmetic Spark's and DuckDB's percent_rank use — and 0.0
    * for single-row keys (both engines' convention; the raw division
    * would yield NaN, which Spark orders ABOVE every double, silently
    * passing `pr >= t` filters). */
  def withPercentRank(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    withRank(df, keys, order)
      .withColumn("pr",
        when(col("gcount") === 1L, lit(0.0))
          .otherwise((col("grank") - 1L).cast("double") /
            (col("gcount") - 1L).cast("double")))

  /** ntile twin: `nt` = the SQL-standard ntile bucket (first
    * `gcount % n` buckets get ⌈gcount/n⌉ rows, the rest ⌊gcount/n⌋) —
    * integer arithmetic on the exact global rank, identical to
    * `ntile(n) OVER (ORDER BY ...)` in both engines. */
  def withNtile(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    val big = col("gcount") / n + 1L // size of the first (gcount % n) buckets
    val cut = (col("gcount") % n) * big // ranks 1..cut live in big buckets
    withRank(df, keys, order)
      .withColumn("nt",
        when(col("grank") <= cut, (col("grank") - 1L) / big + 1L)
          .otherwise((col("grank") - cut - 1L) / (col("gcount") / n) + (col("gcount") % n) + 1L)
          .cast("int"))
  }
}
