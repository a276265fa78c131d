package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Degenerate-corpus behavior of the LSH candidate generators: a
  * 1000-identical-doc corpus makes every LSH band bucket maximally hot.
  * The grouped-by-signature in-bucket generation must stay
  * output-bounded (pair EMISSION is inherently O(n²) here because all
  * pairs are true duplicates — but signature/fingerprint COMPARES must
  * not be) and still produce the exact pair set. */
class TextDegenerateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("degenerate").toString
    import spark.implicits._
    val same = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    val distinct = Seq(
      "completely unrelated text about database engines and query optimization layers",
      "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll kkk jjj iii hhh",
      "1234 5678 9012 3456 numerical content entirely different from all other rows")
    val rows = (0 until 1000).map(i => (i.toLong, same, "en")) ++
      distinct.zipWithIndex.map { case (t, i) => (2000L + i, t, "en") }
    rows.toDF("doc_id", "text", "lang")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("minhash LSH: 1000 identical docs complete via group expansion, exact pair set") {
    val t0 = System.nanoTime()
    val pairs = TextOps.queries("dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dt = (System.nanoTime() - t0) / 1e9
    // all C(1000,2) identical pairs, nothing involving the distinct docs
    assert(pairs.length === 1000 * 999 / 2)
    assert(pairs.forall { case (a, b) => a < b && b < 1000 })
    // output-bounded generation: well under a minute even on local[4]
    assert(dt < 120, f"degenerate corpus took $dt%.1fs - quadratic bucket?")
  }

  test("simhash banding: 1000 identical docs complete, hamming-0 pair set") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = TextOps.simhashPairs(d, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val identical = pairs.filter { case (a, b, _) => a < 1000 && b < 1000 }
    assert(identical.length === 1000 * 999 / 2)
    assert(identical.forall(_._3 === 0))
    assert(pairs.forall { case (a, b, _) => a < b })
  }
}
