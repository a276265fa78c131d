package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `classic.SparkSession.internalCreateDataFrame`
  * (private[sql]): lets DistributedRank's specialized per-row pass
  * stay at the InternalRow level end-to-end — `toRdd` in,
  * UnsafeProjection out, no per-row external Row materialization and
  * no generic RowEncoder round-trip (VERDICT r17 task 2: the
  * `Row.fromSeq(row.toSeq :+ …)` pass was the engine's one
  * interpreter-hostile hot loop). Same technique as
  * [[GraftExpressionBridge]]. */
object GraftDataFrameBridge {
  def internalCreateDataFrame(spark: SparkSession,
      rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
