package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the MOSS guarantee for dedup_substring_pairs: any shared
  * verbatim run of >= k+w-1 = 23 chars MUST produce a pair; disjoint
  * texts must not. */
class SubstringPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("sspairs").toString
    import spark.implicits._
    val run = "the exact shared run of letters" // 31 chars >= 23
    Seq(
      (0L, s"prefix alpha $run suffix omega"),
      (1L, s"totally different lead-in then $run and more trailing words"),
      (2L, "no overlap here at all just unrelated content entirely"),
      // shares only short fragments (< 23 chars) with doc 0
      (3L, "prefix alpha beta gamma delta unrelated remainder text"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("23+ char shared run is always detected; disjoint docs never pair") {
    val pairs = PipelineOps.queries("dedup_substring_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), s"shared 31-char run missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"disjoint doc paired: ${pairs.toSeq}")
  }
}
