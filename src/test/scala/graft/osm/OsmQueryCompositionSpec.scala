package graft.osm

import org.scalatest.funsuite.AnyFunSuite

/** Query composition + validation semantics
  * (reference osmquery.py:148-209). */
class OsmQueryCompositionSpec extends AnyFunSuite {

  test("append merges, any-value keys win, lists dedupe") {
    // with keepFirst=false the exclude side must exist before keep
    // (validated on every composition step, reference osmquery.py:155-157)
    val q = OsmQuery(nodes = true, keepFirst = false)
      .appendExclude(Map("area" -> Seq("yes")))
      .appendKeep(Map("highway" -> Seq("residential")))
      .appendKeep(Map("highway" -> Seq("service", "residential"),
        "building" -> Nil))
    assert(q.keep.get("highway").toSet === Set("residential", "service"))
    assert(q.keep.get("building") === Nil) // any-value match
    // any-value (empty) swallows later specific values
    val q2 = q.appendKeep(Map("building" -> Seq("yes")))
    assert(q2.keep.get("building") === Nil)
    assert(q.exclude.get("area") === Seq("yes"))
  }

  test("appendTags / appendMustTags / appendRelationType dedupe and keep order") {
    val q = OsmQuery(ways = true, keepFirst = false)
      .appendTags(Seq("highway", "name"))
      .appendTags(Seq("name", "oneway"))
      .appendMustTags(Seq("highway"))
      .appendRelationType(Seq("route", "route"))
    assert(q.tags.get === Seq("highway", "name", "oneway"))
    assert(q.mustTags === Seq("highway"))
    assert(q.relationType.get === Seq("route"))
  }

  test("validation mirrors the reference's keep/keep_first constraints") {
    intercept[IllegalArgumentException] {
      OsmQuery(nodes = true, keepFirst = true,
        exclude = Some(Map("a" -> Nil))) // keep missing
    }
    intercept[IllegalArgumentException] {
      OsmQuery(nodes = true, keepFirst = false,
        keep = Some(Map("a" -> Nil))) // exclude missing
    }
    intercept[IllegalArgumentException] {
      OsmQuery(ways = true, topology = true) // needs geometry
    }
    intercept[IllegalArgumentException] {
      OsmQuery.default("nonsense")
    }
  }

  test("defaults carry the reference's shapes") {
    assert(OsmQuery.highways.ways && !OsmQuery.highways.nodes)
    assert(OsmQuery.highways.mustTags === Seq("highway"))
    assert(!OsmQuery.highways.keepFirst)
    assert(OsmQuery.highways.exclude.get("area") === Seq("yes"))
    assert(OsmQuery.buildings.relations && OsmQuery.buildings.ways)
    assert(OsmQuery.pois.nodes && OsmQuery.pois.ways && !OsmQuery.pois.relations)
  }
}
