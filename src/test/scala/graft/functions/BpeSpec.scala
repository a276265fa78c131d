package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The BPE kernel's determinism rests on a structural property of the
  * merge table (well-formedness) plus an equivalence claim (one pass
  * per rule in priority order ≡ classic iterative lowest-rule-first
  * BPE). Both are pinned here — the oracle gate only sees the 31-word
  * corpus vocabulary, so a regression in the equivalence argument
  * would otherwise hide until the vocabulary grows. */
class BpeSpec extends AnyFunSuite {

  test("merge table is well-formed: components are base chars or earlier outputs") {
    Bpe.Merges.zipWithIndex.foreach { case ((x, y), i) =>
      val earlier = Bpe.Merges.take(i).map { case (a, b) => a + b }.toSet
      Seq(x, y).foreach { c =>
        assert(c.length == 1 || earlier(c),
          s"rule $i component '$c' is neither a base char nor an earlier output")
      }
    }
  }

  /** Reference implementation: classic iterative BPE — repeatedly find
    * the LOWEST-index rule with any occurrence, merge its LEFTMOST
    * occurrence, re-evaluate from scratch. The slowest, most
    * conservative formulation. */
  private def iterative(word: String): Vector[String] = {
    var syms: Vector[String] = Bpe.baseSymbols(word)
    var done = false
    while (!done) {
      val hit = Bpe.Merges.find { case (x, y) =>
        (0 until syms.length - 1).exists(i => syms(i) == x && syms(i + 1) == y)
      }
      hit match {
        case None => done = true
        case Some((x, y)) =>
          val i = (0 until syms.length - 1)
            .find(i => syms(i) == x && syms(i + 1) == y).get
          syms = (syms.take(i) :+ (x + y)) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("merge-order determinism: sequential per-rule pass == iterative BPE (random words)") {
    val alphabet = "abcdefghijklmnopqrstuvwy"
    val rnd = new scala.util.Random(0xB9E)
    (0 until 2000).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Bpe.encode(w) === iterative(w), s"divergence on '$w'")
    }
    // abutting-occurrence chains (the SQL multi-pass motivation) and
    // the corpus vocabulary itself
    val targeted = Seq("ththththe", "ererer", "atatat", "ordorder", "aaaa") ++
      Seq("a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window")
    targeted.foreach(w => assert(Bpe.encode(w) === iterative(w), s"divergence on '$w'"))
  }

  test("segmentation is lossless and tokens come from the closed symbol set") {
    val symbols = ('a' to 'z').map(_.toString).toSet ++
      Bpe.Merges.map { case (x, y) => x + y }
    val words = Seq("the", "order", "customer", "window", "batch", "value",
      "table", "stream", "query", "zzz")
    words.foreach { w =>
      val enc = Bpe.encode(w)
      assert(enc.mkString === w, s"lossy segmentation of '$w': $enc")
      assert(enc.forall(symbols), s"unknown symbol in $enc")
    }
  }

  test("pinned encodings: the merge table actually compresses the corpus vocabulary") {
    assert(Bpe.encode("the") === Vector("the"))
    assert(Bpe.encode("order") === Vector("ord", "er"))
    assert(Bpe.encode("batch") === Vector("b", "at", "ch"))
    assert(Bpe.encode("table") === Vector("ta", "b", "le"))
    assert(Bpe.encode("customer") === Vector("c", "u", "st", "o", "m", "er"))
    assert(Bpe.count("window") < "window".length, "no compression on 'window'")
  }

  test("trainer: distributed bpeTrain equals the classic single-machine reference") {
    // classic reference on the sf0.001 corpus vocabulary
    val spark = graft.sources.SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val words = scala.collection.mutable.HashMap.empty[String, Long]
    spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().foreach { r =>
        r.getString(0).split(" ", -1).foreach(w =>
          words.update(w, words.getOrElse(w, 0L) + 1L)) }
    var seg = words.keys.map(w => w -> Bpe.baseSymbols(w)).toMap
    val ref = (1 to 8).map { i =>
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        val s = seg(w)
        (0 until s.length - 1).foreach { j =>
          pc.update((s(j), s(j + 1)), pc.getOrElse((s(j), s(j + 1)), 0L) + c) }
      }
      // self-pairs excluded — the trained variant's documented
      // selection rule (TextOps.bpeTrain)
      val ((l, r), n) = pc.toSeq.filter { case ((a, b), _) => a != b }
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      // the oracle resolves an abutting chain of k occurrences of the
      // SELECTED pair in ~k replace passes — assert the corpus never
      // presents a chain longer than SqlPasses at the segmentation
      // state the merge actually applies to (ADVICE r14: the <450
      // word-length guard alone admits a >10-symbol alternation that
      // would silently diverge from mergePass's single scan)
      val maxChain = seg.valuesIterator.map { s =>
        var best = 0; var run = 0; var j = 0
        while (j < s.length - 1) {
          if (s(j) == l && s(j + 1) == r) { run += 1; if (run > best) best = run; j += 2 }
          else { run = 0; j += 1 }
        }
        best
      }.max
      assert(maxChain <= Bpe.SqlPasses,
        s"iteration $i pair ($l,$r): abutting chain of $maxChain occurrences " +
          s"exceeds SqlPasses=${Bpe.SqlPasses} — the SQL oracle would under-merge; raise SqlPasses")
      seg = seg.map { case (w, s) => w -> Bpe.mergePass(s, l, r) }
      (i, l, r, n)
    }
    val got = graft.queries.TextOps.bpeTrain(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === ref)
    // the oracle's bounded-range pair index covers words <= 512
    // codepoints (the Spark side is uncapped) — fail here with a
    // pointer long before a longer-token corpus turns the cap into a
    // mysterious oracle mismatch (review r14 pass 3)
    val maxLen = words.keys.map(w => Bpe.baseSymbols(w).length).max
    assert(maxLen < 450,
      s"max word length $maxLen approaches bpeTrainSql's range(1,512) cap — raise bidx first")
    // learned merges actually compress: re-encoding with them shortens
    // the corpus vs raw codepoints
    val rawSyms = words.map { case (w, c) => Bpe.baseSymbols(w).length * c }.sum
    val trained = got.map { case (_, l, r, _) => (l, r) }
    val encSyms = words.map { case (w, c) =>
      trained.foldLeft(Bpe.baseSymbols(w))((s, m) => Bpe.mergePass(s, m._1, m._2)).length * c
    }.sum
    assert(encSyms < rawSyms, s"trained merges do not compress ($encSyms vs $rawSyms)")
    // the tokenizer loop CLOSED: text_bpe_apply (train → broadcast →
    // encode) must count exactly what the reference's final
    // segmentation counts, per document
    val applied = graft.queries.TextOps.bpeApplyCounts(spark, sf)
      .select("doc_id", "n_words", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val expect = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        r.getLong(0) -> (ws.length, ws.map(w => seg(w).length).sum)
      }.toMap
    assert(applied === expect)
  }

  test("base-symbol domain is codepoints: newline and non-BMP text match the SQL's (?s)(.)") {
    // RE2 '(?s)(.)' spaces a word of N codepoints into N symbols; the
    // kernel must count the same N (ADVICE r13 #1). '\n' is a symbol;
    // an astral codepoint (surrogate pair in UTF-16) is ONE symbol.
    assert(Bpe.baseSymbols("a\nb") === Vector("a", "\n", "b"))
    assert(Bpe.count("a\nb") === 3)
    val astral = new String(Character.toChars(0x1F600)) // one codepoint, two chars
    assert(Bpe.baseSymbols("x" + astral + "y") === Vector("x", astral, "y"))
    assert(Bpe.count("x" + astral + "y") === 3,
      "surrogate pair counted as two base symbols — diverges from RE2 codepoint '.'")
    // segmentation stays lossless on mixed content
    assert(Bpe.encode("the\nth" + astral).mkString === "the\nth" + astral)
  }
}
