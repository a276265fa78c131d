package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional data-layout
  * technique behind Delta/Iceberg OPTIMIZE ZORDER: interleaving the
  * bits of several columns gives a single sort key whose ordered
  * ranges are compact in EVERY dimension, so per-file min/max stats
  * stay tight on all participating columns at once and a scan with a
  * predicate on ANY of them can skip files. A plain lexicographic
  * sort gives that only for the leading column.
  *
  * The key is pure codegen'd integer bit arithmetic (shift/and/or of
  * the low `bits` bits of each dimension) — no UDF, no custom
  * expression needed; the identical formula is SQL-expressible for
  * the oracle via [[keySql]]. At 100 TB the layout step is
  * `layout(df, dims)`: range-repartition + in-partition sort on the
  * key, i.e. exactly one shuffle before the write.
  *
  * Dimensions are taken modulo 2^bits (the layout cares about
  * locality of the LOW bits at file granularity; callers bucketing
  * wider domains should pre-bucket, e.g. `col / cellWidth`).
  */
object ZOrder {

  private def terms(dims: Seq[String], bits: Int): Seq[String] = {
    val d = dims.length
    require(d >= 2, "z-order needs at least 2 dimensions")
    require(d * bits <= 63, s"interleaved width ${d * bits} exceeds a signed long")
    for {
      (c, k) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"((($c >> $i) & 1) << ${i * d + k})"
  }

  /** The interleaved key as a Column (long). */
  def key(dims: Seq[String], bits: Int): Column =
    expr(terms(dims, bits).mkString(" + "))

  /** The identical formula as ANSI SQL (for cross-engine oracles). */
  def keySql(dims: Seq[String], bits: Int): String =
    terms(dims, bits).mkString(" + ")

  /** Cluster `df` for writing: one range shuffle + in-partition sort
    * on the interleaved key (the key column is dropped again — it is
    * a layout device, not data). */
  def layout(df: DataFrame, dims: Seq[String], bits: Int, numFiles: Int): DataFrame =
    df.withColumn("__zkey", key(dims, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
}
