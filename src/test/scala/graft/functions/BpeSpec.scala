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
