package graft.geom

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a WKB LineString from (pos, x, y) rows —
  * the SURVEY §7.2 "geometry WKB constructors as Aggregator[IN,BUF,OUT]"
  * extension point, usable as
  * `ds.groupByKey(_.id).agg(LineStringAggregator.toColumn)`.
  *
  * The production geometry path uses `mapGroups` (cheaper: no kryo
  * buffer re-serialization per merge); this Aggregator is the
  * composable-column form for user pipelines that mix geometry with
  * other aggregations in one `agg(...)`.
  */
object LineStringAggregator
    extends Aggregator[(Int, Double, Double), List[(Int, Double, Double)], Array[Byte]] {

  override def zero: List[(Int, Double, Double)] = Nil

  override def reduce(b: List[(Int, Double, Double)],
      a: (Int, Double, Double)): List[(Int, Double, Double)] = a :: b

  override def merge(b1: List[(Int, Double, Double)],
      b2: List[(Int, Double, Double)]): List[(Int, Double, Double)] = b1 ::: b2

  override def finish(b: List[(Int, Double, Double)]): Array[Byte] =
    Wkb.lineString(b.sortBy(_._1).map(p => Wkb.Coord(p._2, p._3)))

  override def bufferEncoder: Encoder[List[(Int, Double, Double)]] =
    Encoders.kryo[List[(Int, Double, Double)]]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
