package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the containment semantic dedup_chunk_containment exists for:
  * a short doc quoted WHOLE inside a long aggregator has tiny Jaccard
  * (so the jaccard rows structurally miss it) but containment ≈ 1 —
  * the Broder 1997 resemblance/containment distinction. */
class ChunkContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("chunkcont").toString
    import spark.implicits._
    // quote: exactly one 32-token chunk (the chunker's window), so the
    // short doc IS one chunk and the aggregator embeds it chunk-aligned
    // (stride 24 → the quote starts at token 24 of the long doc? No —
    // chunks are doc-local windows; containment needs the quote to BE
    // a chunk of both docs, i.e. occupy a full aligned window)
    val quote = (1 to 32).map(i => s"q$i").mkString(" ")
    val longDoc = ((1 to 24).map(i => s"lead$i") ++
      (1 to 32).map(i => s"q$i") ++ (1 to 40).map(i => s"tail$i")).mkString(" ")
    Seq(
      (0L, "en", quote),   // 1 chunk, wholly inside doc 1
      (1L, "en", longDoc), // many chunks, one of them == the quote
      (2L, "en", (1 to 60).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("whole-quote inclusion pairs with containment 1.0; disjoint doc does not") {
    val rows = SearchOps.queries("dedup_chunk_containment")(spark, dir).collect()
    val pair = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(pair.nonEmpty, s"doc-in-doc inclusion missed: ${rows.toSeq}")
    // c_ab = shared / chunks(quote doc) = 1/1
    assert(pair.get.getDouble(3) === 1.0, s"containment of the quoted doc should be 1.0: ${pair.get}")
    // and its Jaccard-side containment is far below the threshold —
    // the long doc has several chunks, only one shared
    assert(pair.get.getDouble(4) < 0.5)
    assert(!rows.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L),
      s"disjoint doc paired: ${rows.toSeq}")
  }
}
