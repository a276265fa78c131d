package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** PMI truth for text_collocations on a constructed corpus: a pair
  * that ALWAYS co-occurs must out-rank a pair of frequent-but-
  * independent words, and the min-count floor must drop hapax pairs
  * (PMI's classic failure mode — a once-seen pair of once-seen words
  * scores the maximum). */
class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("colloc").toString
    import spark.implicits._
    // "strong coffee": 5 co-occurrences, each word only ever in the pair
    // "the" / "cat": frequent but independently scattered
    // "rara avis": ONE co-occurrence of two hapax words (PMI max, but
    // under the cb >= 3 floor)
    val docs = Seq.tabulate(10) { i =>
      val body =
        if (i < 5) s"strong coffee the cat sat on the mat $i"
        else s"the dog cat ran the yard $i rara_x"
      (i.toLong, "en", body)
    } :+ ((10L, "en", "rara avis the end"))
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("always-together pair ranks above frequent independent pairs; hapax floored") {
    val rows = TextOps.queries("text_collocations")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ranked = rows.map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val strongRk = ranked.collectFirst { case (rk, "strong", "coffee") => rk }
    assert(strongRk.nonEmpty, s"perfect collocation missing: ${ranked.toSeq}")
    // every pair involving the scattered high-frequency "the" must rank
    // below the perfect collocation
    ranked.filter(t => t._2 == "the" || t._3 == "the").foreach { t =>
      assert(t._1 > strongRk.get, s"independent pair $t out-ranked the collocation")
    }
    // the hapax pair is floored out despite its maximal PMI
    assert(!ranked.exists(t => t._2 == "rara" && t._3 == "avis"),
      "min-count floor failed: hapax pair surfaced")
  }

  test("pmi value matches the exact count ratio for the perfect pair") {
    val rows = TextOps.queries("text_collocations")(spark, dir).collect()
    val r = rows.find(r => r.getString(1) == "strong" && r.getString(2) == "coffee").get
    val cb = r.getLong(3)
    assert(cb === 5L)
    // NB bigrams = sum over docs of (tokens - 1); cu(strong)=cu(coffee)=5
    val nb = Seq.tabulate(10)(i => if (i < 5) 8L else 7L).sum + 3L
    val expected = BigDecimal((cb.toDouble / 5.0) * (nb.toDouble / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === expected)
  }
}
