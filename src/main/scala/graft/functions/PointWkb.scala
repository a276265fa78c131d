package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** WKB `POINT(x y)` encoder as a native codegen'd Catalyst expression —
  * replaces what used to be the engine's only scalar UDF. Point
  * geometry is emitted once per POI NODE (G1), i.e. millions of rows on
  * a city extract, and a UDF there costs a closure call + boxing per
  * row; the generated code inlines the 21-byte little-endian pack
  * (header + two IEEE-754 doubles) straight into the stage.
  *
  * Byte layout identical to graft.geom.Wkb.point (WkbSpec pins parity).
  */
case class PointWkb(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"point_wkb requires (double, double), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(x: Any, y: Any): Any =
    PointWkb.pack(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.PointWkb.pack($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PointWkb = copy(left = newLeft, right = newRight)

  override def prettyName: String = "point_wkb"
}

object PointWkb {
  /** 21-byte little-endian WKB point: 0x01, type=1, x bits, y bits. */
  def pack(x: Double, y: Double): Array[Byte] = {
    val out = new Array[Byte](21)
    out(0) = 1
    out(1) = 1 // type code 1 = Point; bytes 2..4 stay 0
    var bits = java.lang.Double.doubleToLongBits(x)
    var i = 5
    while (i < 13) { out(i) = (bits & 0xff).toByte; bits >>>= 8; i += 1 }
    bits = java.lang.Double.doubleToLongBits(y)
    while (i < 21) { out(i) = (bits & 0xff).toByte; bits >>>= 8; i += 1 }
    out
  }
}
