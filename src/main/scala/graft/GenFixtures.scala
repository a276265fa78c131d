package graft

/** Regenerates the committed synthetic fixtures under fixtures/
  * (FIXTURES.md §B). Run: sbt "runMain graft.GenFixtures". */
object GenFixtures {
  def main(args: Array[String]): Unit = {
    graft.pbf.MiniWorld.generate()
    println(s"wrote ${graft.pbf.MiniWorld.path}")
  }
}
