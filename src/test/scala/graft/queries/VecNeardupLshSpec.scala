package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Recall proof for the bucketed near-dup sibling: on the sf0.01
  * corpus, `vec_neardup_lsh` must produce EXACTLY the all-pairs
  * baseline's result set — precision 1.0 is structural (exact
  * verification), recall 1.0 is the property the banding parameters
  * (r=5, bands=102 — the r=6/85 first attempt missed ~1/920 true
  * pairs and was replaced, see VectorOps.neardupLsh) were sized for
  * at the 0.4 threshold. */
class VecNeardupLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("vec_neardup_lsh == vec_neardup_pairs (exact recall at sf0.01)") {
    def rows(name: String): Set[(Long, Long, Double)] =
      VectorOps.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows("vec_neardup_pairs")
    val lsh = rows("vec_neardup_lsh")
    assert(exact.nonEmpty)
    val missed = exact -- lsh
    val spurious = lsh -- exact
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
    assert(spurious.isEmpty, s"LSH emitted non-pairs: $spurious")
  }
}
