package graft.functions

/** Deterministic, vocabulary-pinned byte-pair encoding — the real
  * tokenizer shape behind pretraining batch assembly (`text_bpe_tokens`,
  * `pipe_pack_sequences_bpe`), pure JVM, zero deps.
  *
  * The merge table is FIXED (a tiny table hand-trained on the corpus
  * vocabulary) and WELL-FORMED: each rule's components are base
  * characters or outputs of strictly earlier rules. For such a table,
  * applying the rules once each in priority order — each as one
  * left-to-right non-overlapping pass merging every occurrence — is
  * equivalent to the classic iterative BPE ("repeatedly apply the
  * lowest-index rule present anywhere"): a later rule only creates new
  * symbols that no earlier rule references, so earlier rules can never
  * become applicable again after their pass. BpeSpec pins this
  * equivalence against a reference iterative implementation on random
  * words (the merge-order-determinism property, VERDICT r12 #4).
  *
  * SQL twin: per word, space the characters out and run each rule as
  * `replace(s, ' x y ', ' xy ')`. One replace pass diverges from the
  * left-to-right pair scan when occurrences ABUT (" x y x y ": the
  * shared boundary space is consumed by the first match, hiding the
  * second), so the oracle applies each rule's replace [[SqlPasses]]
  * times — abutting chains of n occurrences resolve in n passes, and
  * n is bounded by wordlen/2. Symbols never contain spaces, so passes
  * are otherwise idempotent.
  *
  * Base-symbol domain: CODEPOINTS, on both sides. The SQL spaces
  * characters out with RE2 `(?s)(.)` — `.` matches whole codepoints
  * and, under `(?s)`, newlines too — so [[encode]] iterates
  * codepoints (a surrogate pair is ONE base symbol, a newline is a
  * symbol like any other), keeping the JVM kernel and the oracle in
  * lockstep on non-ASCII and newline-bearing text (ADVICE r13 #1;
  * BpeSpec pins both cases).
  */
object Bpe extends Serializable {

  /** Merge rules in priority order. Components are base chars or
    * earlier outputs (well-formedness — required for the single-pass ≡
    * iterative equivalence above; BpeSpec asserts it structurally). */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"),   // th: the
    ("th", "e"),  // the → one token
    ("c", "h"),   // ch: batch
    ("e", "r"),   // er: order, merge, customer, filter
    ("o", "r"),   // or: sort, order
    ("a", "t"),   // at: data, batch
    ("t", "a"),   // ta: table
    ("s", "t"),   // st: fast, stream, customer
    ("a", "n"),   // an: scan
    ("i", "n"),   // in: window, line, join
    ("r", "o"),   // ro: row, group
    ("a", "l"),   // al: small, value
    ("l", "e"),   // le: table
    ("u", "e"),   // ue: value, query
    ("o", "w"),   // ow: slow, window (row already ro+w)
    ("or", "d"))  // ord: order → ord + er

  /** Max abutting same-pair occurrences per word the SQL replace chain
    * must resolve; one extra pass of headroom over len/2 at the
    * corpus' longest word (8 chars). */
  val SqlPasses = 5

  /** Codepoint split — the base-symbol domain shared with the SQL
    * twin's `(?s)(.)` spacing (see the object scaladoc). */
  private[graft] def baseSymbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** One left-to-right pass merging every non-overlapping adjacent
    * (x, y) into xy — the shared kernel of [[encode]] and the trainer
    * (`text_bpe_train`)'s segmentation update. */
  private[graft] def mergePass(syms: Vector[String], x: String,
      y: String): Vector[String] = {
    if (syms.length < 2) syms
    else {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          out += x + y
          i += 2
        } else {
          out += syms(i)
          i += 1
        }
      }
      out.result()
    }
  }

  /** Encode one word: per rule, one left-to-right pass merging every
    * non-overlapping adjacent (x, y) into xy. */
  def encode(word: String): Vector[String] = {
    var syms: Vector[String] = baseSymbols(word)
    Merges.foreach { case (x, y) => syms = mergePass(syms, x, y) }
    syms
  }

  /** Token count of one word. */
  def count(word: String): Int = encode(word).length

  /** The oracle's per-rule replace chain over a spaced-out word
    * column expression (shared by the text_bpe_tokens and
    * pipe_pack_sequences_bpe SQL so both stay in lockstep). */
  def sqlReplaceChain(spacedExpr: String): String =
    Merges.foldLeft(spacedExpr) { case (acc, (x, y)) =>
      (1 to SqlPasses).foldLeft(acc)((a, _) => s"replace($a, ' $x $y ', ' $x$y ')")
    }
}
