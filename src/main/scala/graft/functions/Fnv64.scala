package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit string hash as a native Catalyst expression with full
  * whole-stage codegen — the engine's demonstration of extension point
  * (b) from the build brief (custom `Expression` over a UDF): the
  * generated code inlines the byte loop into the stage, no boxing, no
  * closure call per row.
  *
  * It is the engine's content-fingerprint hash (text_fingerprint,
  * SimHash token hashing, multimodal histogram fingerprints): a pure
  * byte-fold whose arithmetic a SQL oracle replicates exactly, unlike
  * block-based xxhash64.
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fnv64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Fnv64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)

  override def prettyName: String = "fnv64"
}

object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= Prime
      i += 1
    }
    h
  }

  /** Per-session registration for use from SQL / `expr("fnv64(...)")`
    * without configuring extensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64", exprs => {
        require(exprs.size == 1, s"fnv64 expects exactly 1 argument, got ${exprs.size}")
        Fnv64(exprs.head)
      }, "scala_udf")
}

/** SparkSessionExtensions registration — extension point (c): makes
  * `fnv64` usable from SQL text when the session is built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fnv64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fnv64].getName, "fnv64"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"fnv64 expects exactly 1 argument, got ${children.size}")
        Fnv64(children.head)
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("point_wkb"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PointWkb].getName, "point_wkb"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"point_wkb expects exactly 2 arguments, got ${children.size}")
        PointWkb(children.head, children(1))
      }))
    // extension point (c) optimizer rule: tag-key-existence filters on
    // an osmpbf relation gain the decoder-level mustTagKeys pushdown
    e.injectOptimizerRule(_ => graft.plans.MustTagPushdown)
  }
}
