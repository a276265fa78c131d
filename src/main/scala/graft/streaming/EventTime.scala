package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive event-time access.
  *
  * The `events` table's `ts` column has shipped in two physical forms:
  * raw nanosecond BIGINT (parquet TIMESTAMP(NANOS) read under
  * `spark.sql.legacy.parquet.nanosAsLong`) and parquet `timestamp[us]`
  * (Spark TIMESTAMP_NTZ). Hard-coding either killed six queries when
  * the upstream generator switched (round-8 post-mortem), so ALL
  * event-time arithmetic goes through this adapter and lives in the
  * MICROSECOND domain — the precision the DuckDB oracle uses
  * (`epoch_us`), exact for every form.
  *
  * Sessions run with `spark.sql.session.timeZone=UTC`, so the
  * NTZ → TIMESTAMP cast is the identity on the underlying micros.
  */
object EventTime {

  /** Event time as epoch microseconds (LongType), whatever the physical
    * type of `tsCol`. ns-longs truncate (floor for the positive epoch
    * range) exactly as the oracle engine does when it reads
    * TIMESTAMP(NANOS) parquet at µs precision. */
  def tsUs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType         => expr(s"`$tsCol` div 1000")
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for `$tsCol`: $other " +
          "(expected ns BIGINT, TIMESTAMP or TIMESTAMP_NTZ)")
    }
}
