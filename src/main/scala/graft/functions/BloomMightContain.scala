package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership probe as a native, codegen'd Catalyst
  * expression — the build-side half of the 100 TB semi-join pattern:
  * build a Bloom filter over the (small) build side's join keys once,
  * ship its serialized bytes inside the plan, and prune the probe-side
  * scan BEFORE the shuffle. False positives are later removed by the
  * exact semi join, so the end result is byte-identical to the plain
  * semi join while the shuffle only carries rows that might match.
  *
  * This is the same shape Spark's own runtime row-group filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) injects —
  * expressed here as a reusable, deterministic operator the engine
  * controls: the filter bytes are computed from the build side with
  * `DataFrameStatFunctions.bloomFilter` and embedded as a plan
  * constant, so the pruning engages regardless of AQE heuristics.
  *
  * The serialized filter is deserialized once per executor (lazy
  * transient) and referenced from generated code via `addReferenceObj`
  * — per-row cost is the sketch's k hash probes, no closure call, no
  * boxing.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${child.dataType}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  /** Column-API entry: `df.filter(BloomMightContain.probe(col("k"), bf))`. */
  def probe(key: Column, bloom: BloomFilter): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    GraftExpressionBridge.column(
      BloomMightContain(GraftExpressionBridge.expression(key), bytes))
  }
}
