package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins `removeDupSpans`' hot-gram behavior at the bound (VERDICT r16
  * #3) on a constructed boilerplate-heavy corpus: 4 docs share one
  * license-style span (gram df 4), 2 docs share another (df 2).
  *  - unbounded default: exact — both spans cut from every non-owner;
  *  - unbounded with the guard BELOW the corpus's hottest gram: loud
  *    IllegalStateException naming `spark.graft.dupspans.maxGramDf`,
  *    never a silent df²-quadratic join;
  *  - maxGramDf set: grams above the df cap are skipped (the
  *    boilerplate survives — the caller's explicit recall trade),
  *    cooler duplicates still cut. */
class DupSpansGuardSpec extends AnyFunSuite {

  private val boiler =
    "LICENSE: permission is hereby granted free of charge to any person obtaining a copy"
  private val dup2 =
    "shared finding: the two results agree to within one part in a million exactly"

  private lazy val dir: String = {
    val spark = graft.sources.SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, s"alpha document zero unique head $boiler and a zero tail"),
      (1L, s"bravo doc one distinct header $boiler with one ending"),
      (2L, s"charlie two openings here $boiler plus two closing"),
      (3L, s"delta three prologue text $boiler and three epilogue $dup2 end"),
      (4L, s"echo four preamble words $dup2 four postscript unique")
    ).toDF("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("dupspan_guard").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(): Map[Long, (Long, String)] = {
    val spark = graft.sources.SparkTestSession.spark
    PipelineOps.removeDupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
  }

  test("unbounded default is exact: both spans cut from every non-owner") {
    val spark = graft.sources.SparkTestSession.spark
    spark.conf.unset("spark.graft.dupspans.maxGramDf")
    spark.conf.unset("spark.graft.dupspans.guardPairs")
    val m = run()
    assert(m(0)._1 === 0L && m(0)._2.contains(boiler), "lowest id keeps its copy")
    Seq(1L, 2L, 3L).foreach(id =>
      assert(!m(id)._2.contains(boiler), s"doc $id must cut the boilerplate"))
    assert(m(3)._2.contains(dup2), "doc 3 owns dup2 (lowest id)")
    assert(!m(4)._2.contains(dup2) && m(4)._1 === 1L)
  }

  test("guard below the corpus's candidate-pair volume fails loudly, naming the conf") {
    val spark = graft.sources.SparkTestSession.spark
    // fixture volume Σ occ² is ~2k (boilerplate grams occur 4x each);
    // a guard of 500 must trip BEFORE the join is planned
    spark.conf.set("spark.graft.dupspans.guardPairs", "500")
    try {
      val e = intercept[IllegalStateException](run())
      assert(e.getMessage.contains("spark.graft.dupspans.maxGramDf"), e.getMessage)
      assert(e.getMessage.contains("candidate pairs"), e.getMessage)
      assert(e.getMessage.contains("occurs 4 times"), e.getMessage)
    } finally spark.conf.unset("spark.graft.dupspans.guardPairs")
  }

  test("maxGramDf set: hot grams skipped (explicit recall trade), cool dups still cut") {
    val spark = graft.sources.SparkTestSession.spark
    spark.conf.set("spark.graft.dupspans.maxGramDf", "3")
    try {
      val m = run()
      // boilerplate grams (df 4 > 3) are skipped → the span survives
      Seq(0L, 1L, 2L, 3L).foreach(id =>
        assert(m(id)._2.contains(boiler), s"doc $id boilerplate skipped by the cap"))
      // the df-2 duplicate is under the cap → still removed
      assert(m(3)._2.contains(dup2), "doc 3 owns dup2")
      assert(!m(4)._2.contains(dup2) && m(4)._1 === 1L)
    } finally spark.conf.unset("spark.graft.dupspans.maxGramDf")
  }
}
