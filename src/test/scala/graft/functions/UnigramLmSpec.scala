package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the unigram-LM kernel's determinism contract (tie rule, skip
  * semantics for uncovered predecessors) and the trainer's equivalence
  * to a classic single-machine hard-EM reference — the oracle gate
  * only sees the 31-word corpus, so a regression in either would
  * otherwise hide until the vocabulary grows. Also guards the corpus
  * inside the SQL oracle's DP-unroll budget (the BpeSpec bidx
  * pattern). */
class UnigramLmSpec extends AnyFunSuite {
  import UnigramLm._

  test("viterbi segmentation is lossless and respects MaxPiece") {
    val model = Map("a" -> 100L, "b" -> 100L, "ab" -> 300L, "ba" -> 50L,
      "abab" -> 900L, "bb" -> 10L)
    Seq("a", "ab", "abab", "ababab", "bbbb", "abba").foreach { w =>
      val enc = viterbi(w, model)
      assert(enc.mkString === w, s"lossy segmentation of '$w': $enc")
      assert(enc.forall(_.length <= MaxPiece), s"overlong piece in $enc")
    }
  }

  test("tie rule: equal path scores resolve to the longer last piece") {
    // score(["a","b"]) = (2^19/2^20)·(2^19/2^20) = 1/4 exactly
    // score(["ab"])    =  2^18/2^20              = 1/4 exactly
    val model = Map("a" -> 524288L, "b" -> 524288L, "ab" -> 262144L)
    assert(viterbi("ab", model) === Vector("ab"),
      "equal-score tie must prefer the longer last piece (the SQL l DESC rule)")
  }

  test("a word with an uncovered character segments to empty (SQL-join parity)") {
    val model = Map("a" -> 1000L, "ab" -> 1000L)
    assert(viterbi("abc", model) === Vector.empty)
    // and an uncovered MIDDLE position must not leak a negative-score
    // path through the skip logic
    assert(viterbi("aba", Map("ab" -> 1000L)) === Vector.empty)
    assert(viterbi("", model) === Vector.empty)
  }

  test("zero-numerator pieces stay usable (all-zero paths pick longest arms)") {
    val model = Map("a" -> 0L, "b" -> 0L, "ab" -> 0L)
    val enc = viterbi("ab", model)
    assert(enc === Vector("ab"), s"got $enc")
  }

  test("trainer: distributed unigramModel equals the classic single-machine hard-EM") {
    val spark = graft.sources.SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().foreach { r =>
        r.getString(0).split(" ", -1).foreach(w =>
          if (w.nonEmpty) words.update(w, words.getOrElse(w, 0L) + 1L)) }
    // the corpus must stay inside the oracle's DP-position unroll —
    // fail HERE with the bound named, not as a bare oracle mismatch
    val maxLen = words.keys.map(_.length).max
    assert(maxLen <= MaxWordSql,
      s"max word length $maxLen exceeds unigramDpCtes' $MaxWordSql-position unroll — raise MaxWordSql")
    // classic reference: seed from weighted substrings, Iters hard-EM
    // rounds of Viterbi counts + the single-char floor
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(MaxPiece, w.length - i)
      } seed.update(w.substring(i, i + l), seed.getOrElse(w.substring(i, i + l), 0L) + f)
    }
    val chars = words.keys.flatMap(_.map(_.toString)).toSet
    def toNum(cnt: collection.Map[String, Long]): Map[String, Long] = {
      val t = cnt.valuesIterator.sum
      cnt.iterator.map { case (p, c) => p -> c * Lattice / t }.toMap
    }
    var model = toNum(seed)
    var counts = Map.empty[String, Long]
    (1 to Iters).foreach { _ =>
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        viterbi(w, model).foreach(p => usage.update(p, usage.getOrElse(p, 0L) + f)) }
      counts = (usage.keySet ++ chars).iterator.map { p =>
        p -> (usage.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
      }.toMap
      model = toNum(counts)
    }
    val ref = counts.toVector.sortBy(_._1).map { case (p, c) => (p, c, model(p)) }
    val got = graft.queries.TextOps.unigramModel(spark, sf)
    assert(got === ref)
    // the trained model actually exercises multi-piece paths: MaxPiece
    // < the corpus's 8-char words, so total tokens exceed total words
    val toks = words.iterator.map { case (w, f) => viterbi(w, model).length * f }.sum
    val nWords = words.valuesIterator.sum
    assert(toks > nWords, s"degenerate identity segmentation ($toks tokens / $nWords words)")
  }

  test("maxSeedVocab cap keeps every corpus char segmentable") {
    val spark = graft.sources.SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.graft.unigram.maxSeedVocab", "10")
    try {
      val model = graft.queries.TextOps.unigramModel(spark, sf)
      val m = model.map(x => x._1 -> x._3).toMap
      val sample = Seq("customer", "window", "vector")
      sample.foreach { w =>
        val enc = viterbi(w, m)
        assert(enc.nonEmpty && enc.mkString === w,
          s"capped-seed model cannot segment corpus word '$w'")
      }
    } finally spark.conf.unset("spark.graft.unigram.maxSeedVocab")
  }
}
