package graft.osm

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Typed element model over the osmpbf scan schema — `Dataset[OsmEntity]`
  * for callers who want compile-time field checks; the DataFrame surface
  * stays primary (dynamic tag projection needs it). */
final case class OsmMember(role: String, ref: Long, mtype: Byte)

final case class OsmEntity(
    id: Long,
    `type`: Byte,
    lat: Option[Double],
    lon: Option[Double],
    tags: Map[String, String],
    refs: Seq[Long],
    members: Seq[OsmMember],
    version: Option[Int],
    timestamp: Option[java.sql.Timestamp],
    changeset: Option[Long]) {
  def isNode: Boolean = `type` == 0
  def isWay: Boolean = `type` == 1
  def isRelation: Boolean = `type` == 2
}

object OsmEntity {
  def read(spark: SparkSession, path: String): Dataset[OsmEntity] =
    spark.read.format("osmpbf").load(path).as(Encoders.product[OsmEntity])
}
