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

  // a boilerplate-heavy corpus: one license-header-ish run shared by
  // ALL docs (an un-guarded join emits all C(n,2) pairs from it
  // alone) plus one genuine pair overlap unique to docs 100/101
  private lazy val boilerDir: String = {
    val d = java.nio.file.Files.createTempDirectory("sspairs_df").toString
    import spark.implicits._
    val boiler = "this exact license header boilerplate appears in every single document of the corpus"
    val shared = "a genuinely shared unique run of letters"
    (0 until 12).map { i =>
      val extra = if (i == 10 || i == 11) s" $shared" else ""
      // per-doc padding built from the doc index so no two bodies
      // share a >= 20-char run (plain "x"*i padding gives high-index
      // doc pairs accidental common runs)
      (100L + i, s"doc $i distinct body ${("z" + i) * 6} $boiler tail$extra")
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("shingle-df guard collapses boilerplate pairs; default off keeps them") {
    def run(): Set[(Long, Long)] =
      PipelineOps.queries("dedup_substring_pairs")(spark, boilerDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = run()
    // default (guard off): the boilerplate alone pairs every doc with
    // every other — all C(12,2) = 66 pairs present
    assert(full.size == 66, s"expected all 66 boilerplate pairs, got ${full.size}")
    spark.conf.set("spark.graft.winnow.maxFpDf", "6")
    try {
      val guarded = run()
      // fps from the shared-by-all-12 boilerplate have df 12 > 6 and
      // are dropped; the df-2 genuine overlap survives
      assert(guarded.contains((110L, 111L)),
        s"genuine low-df overlap lost under the guard: $guarded")
      assert(guarded.size < full.size / 4,
        s"boilerplate pair explosion not collapsed: ${guarded.size} of ${full.size}")
      assert(guarded.subsetOf(full), "guard fabricated pairs")
    } finally spark.conf.unset("spark.graft.winnow.maxFpDf")
  }
}
