package graft

/** Regenerates the committed synthetic fixtures under fixtures/
  * (FIXTURES.md §B) and pre-generates the 2M-node BigWorld extract the
  * osm_big_* bench queries read — running this BEFORE Bench means a
  * cold round's rep1 never pays the ~10 s in-process generation (the
  * file is persisted under /tmp keyed by its parameters, so re-runs
  * are a stat call). Run: sbt "runMain graft.GenFixtures". */
object GenFixtures {
  def main(args: Array[String]): Unit = {
    graft.pbf.MiniWorld.generate()
    println(s"wrote ${graft.pbf.MiniWorld.path}")
    graft.pbf.BigWorld.ensure(graft.queries.OsmQueries.BigPath, 2000000, 100000)
    println(s"ensured ${graft.queries.OsmQueries.BigPath}")
    graft.queries.OsmQueries.ensureSplit()
    println(s"ensured ${graft.queries.OsmQueries.SplitDir}")
  }
}
