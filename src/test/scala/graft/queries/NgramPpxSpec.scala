package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the bigram-LM quality filter's MODEL semantics against a
  * single-machine reference: add-one-smoothed inverse conditionals
  * (c(w1·)+V)/(c(w1,w2)+1) on the 2^-20 lattice, arithmetic-mean doc
  * score, and the ≥ 0.99 percent-rank flag — so an engine-side plan
  * change that silently shifts the MODEL (e.g. counting final tokens
  * as contexts, or V from bigram vocab instead of unigram vocab)
  * fails here with the model named, not as a bare oracle hash
  * mismatch. */
class NgramPpxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("corpus stays far inside the oracle's range(1,1024) bigram cap") {
    // the text_ngram_ppx oracle enumerates bigram positions via
    // range(1, 1024) while the Spark side is uncapped (ADVICE r15): a
    // doc with > 1023 bigrams would surface as a bare oracle hash
    // mismatch — fail HERE with the bound named instead (the chunkCtes
    // maxChunks<900 doctrine)
    import org.apache.spark.sql.functions._
    // ALL gate SFs, not just sf0.001 (VERDICT r16 #5a: the gate runs
    // at sf0.01/sf0.1 too, and a long doc there would surface as a
    // bare hash mismatch this guard exists to pre-empt)
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sfn =>
      val maxToks = spark.read.parquet(s"/root/testdata/$sfn/documents.parquet")
        .filter(col("text").isNotNull)
        .select(size(split(col("text"), " ", -1)).as("n"))
        .agg(max(col("n"))).collect()(0).getInt(0)
      assert(maxToks < 900,
        s"a $maxToks-token doc at $sfn approaches the oracle's range(1,1024) bigram " +
          "cap — raise gs in TextOps.oracle(text_ngram_ppx) AND (text_collocations) first")
    }
  }

  test("doc scores equal the classic add-one bigram reference; worst 1% flagged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getString(1).split(" ", -1) }
      .toMap
    val bigrams = docs.view.mapValues(ts => ts.dropRight(1).zip(ts.drop(1))).toMap
    val cb = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = bigrams.values.flatten.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = docs.values.flatten.toSet.size.toLong
    // Spark round() semantics: BigDecimal HALF_UP (the repo's JVM
    // round-replication rule), not floor(x+0.5) or rint
    def snap(x: Double) = java.math.BigDecimal.valueOf(x * 1048576d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1048576d
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = bigrams.collect { case (id, bs) if bs.nonEmpty =>
      val qs = bs.map(b => snap((cu(b._1) + v).toDouble / (cb(b) + 1).toDouble))
      id -> (bs.length.toLong, r6(qs.sum / bs.length))
    }
    val got = TextOps.queries("text_ngram_ppx")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, (n, ppx)) =>
      assert(got(id)._1 === n, s"doc $id bigram count")
      assert(got(id)._2 === ppx, s"doc $id score: ${got(id)._2} vs reference $ppx")
    }
    // the flag is the worst percentile: pr >= 0.99 over a complete
    // order leaves ceil(n/100)-ish docs — at least one, never more
    // than 2% on this fixture, and they carry the HIGHEST scores
    val flagged = got.filter(_._2._3 == 1)
    assert(flagged.nonEmpty, "no doc flagged — threshold degenerate")
    assert(flagged.size <= got.size / 50, s"${flagged.size}/${got.size} flagged")
    val maxUnflagged = got.filter(_._2._3 == 0).values.map(_._2).max
    assert(flagged.values.forall(_._2 >= maxUnflagged),
      "a flagged doc scores below an unflagged one")
  }
}
