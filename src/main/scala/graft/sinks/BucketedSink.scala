package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed parquet sink — the co-location half of the 100 TB join
  * story: land a table hash-bucketed (and sorted) on its join key so
  * every downstream equi-join or aggregation on that key reads
  * pre-partitioned data and plans WITHOUT a shuffle on either side.
  * At warehouse scale this converts the nightly fact-to-fact join from
  * two full-table exchanges into a zero-exchange sort-merge join —
  * the single biggest shuffle a pipeline usually pays.
  *
  * Spark's bucketing metadata lives in the session catalog, so the
  * sink registers an EXTERNAL table (data at `path`) via saveAsTable;
  * readers use `spark.table(name)`. BucketedJoinSpec pins the plan
  * contract: a self-equi-key join of two tables bucketed `buckets`-way
  * on the same key contains no Exchange.
  */
object BucketedSink {

  /** Write `df` as an external parquet table bucketed and sorted by
    * `key` into `buckets` buckets, registered as `table`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    // SaveMode.Overwrite already replaces an existing table; an
    // explicit DROP first would only widen the non-atomic window in
    // which readers see no table at all if the new write fails
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }
}
