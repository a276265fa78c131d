package graft.osm

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.geom.{LineStringAggregator, Wkb}

class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Dataset[OsmEntity] typed surface over the scan") {
    graft.pbf.MiniWorld.generate()
    val ds = OsmEntity.read(spark, graft.pbf.MiniWorld.path)
    val cafe = ds.filter(_.tags.get("amenity").contains("cafe")).collect()
    assert(cafe.length === 1 && cafe.head.id === 1L && cafe.head.isNode)
    assert(cafe.head.lat.exists(l => math.abs(l - 43.5) < 1e-6))
    val w = ds.filter(e => e.isWay && e.id == 101L).collect().head
    assert(w.refs === Seq(20L, 21L, 22L))
    val r = ds.filter(_.isRelation).filter(_.id == 200L).collect().head
    assert(r.members.map(_.role) === Seq("outer", "outer", "outer", "inner"))
    assert(cafe.head.version.contains(3) && cafe.head.changeset.contains(42L))
  }

  test("LineStringAggregator composes in a typed agg") {
    import spark.implicits._
    val rows = Seq( // (lineId, pos, x, y) — pos deliberately out of order
      (7L, 1, 1.0, 1.0), (7L, 0, 0.0, 0.0), (7L, 2, 2.0, 2.0),
      (8L, 0, 5.0, 5.0), (8L, 1, 6.0, 5.0))
      .toDS()
    val got = rows.groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(LineStringAggregator.toColumn.name("wkb"))
      .collect().toMap
    assert(Wkb.readLineString(got(7L)) ===
      Seq(Wkb.Coord(0, 0), Wkb.Coord(1, 1), Wkb.Coord(2, 2)))
    assert(Wkb.readLineString(got(8L)) ===
      Seq(Wkb.Coord(5, 5), Wkb.Coord(6, 5)))
  }
}
