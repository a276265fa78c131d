package graft.functions

/** Unigram-LM tokenizer kernel (Kudo 2018 — the SentencePiece model;
  * the complement of [[Bpe]]'s agglomerative merges): a vocabulary of
  * PIECES with probabilities, segmentation = the Viterbi-best product
  * of piece probabilities over a word. Training is hard-EM
  * (Viterbi-E / count-M) in `TextOps.unigramModel`; this object holds
  * the shared decode kernel plus the cross-engine arithmetic
  * contract.
  *
  * Determinism contract (the vec_kmeans / BM25 doctrine):
  *  - piece probabilities live on the 2^-20 lattice as INTEGER
  *    numerators: num = (count * [[Lattice]]) / total with integer
  *    floor division — exact in both engines;
  *  - a path's score multiplies `num / 2^20` doubles in fixed DP
  *    order (division by a power of two and each product are
  *    IEEE-exact-rounded identically everywhere; only reassociation
  *    is forbidden, and the DP never reassociates);
  *  - the per-position argmax tie rule is total: higher score first,
  *    then the LONGER last piece (for a fixed (word, position,
  *    length) there is exactly one candidate, so no further key is
  *    needed). The SQL twin's `ORDER BY s DESC, l DESC` row_number
  *    is the same rule.
  *
  * Piece length is capped at [[MaxPiece]] = 4 — deliberately BELOW
  * the corpus's 8-char words so the trained model must exercise real
  * multi-piece Viterbi paths (whole-word pieces would otherwise
  * degenerate segmentation to identity). The oracle's DP unroll
  * covers words up to [[MaxWordSql]] positions; UnigramLmSpec guards
  * the corpus inside that budget (the BpeSpec bidx pattern). */
object UnigramLm extends Serializable {

  /** Probability lattice: numerators are integer counts of 2^-20. */
  val Lattice = 1048576L

  /** Maximum piece length considered by seeding and the DP. */
  val MaxPiece = 4

  /** The SQL oracle unrolls DP positions 1..MaxWordSql; words longer
    * than this are outside the oracle's budget (kernel is unbounded). */
  val MaxWordSql = 12

  /** Hard-EM iterations the trainer runs (unrolled in the oracle). */
  val Iters = 2

  /** Viterbi-segment `w` under `model` (piece → lattice numerator).
    * Returns the best-scoring piece sequence, or empty when some
    * prefix cannot be covered (a character absent from the model —
    * impossible for corpus words under the trainer's single-char
    * floor, and the SQL twin likewise drops such words from the DP
    * chain). Arms from uncovered predecessors are skipped, matching
    * the SQL where missing rows simply contribute no candidate. */
  def viterbi(w: String, model: scala.collection.Map[String, Long]): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(score, -1.0)
    score(0) = 1.0
    var j = 1
    while (j <= n) {
      var best = -1.0
      var bestL = 0
      val lm = math.min(j, MaxPiece)
      var l = 1
      while (l <= lm) {
        if (score(j - l) >= 0.0) {
          model.get(w.substring(j - l, j)) match {
            case Some(num) =>
              val sc = score(j - l) * (num.toDouble / Lattice)
              if (sc > best || (sc == best && l > bestL)) { best = sc; bestL = l }
            case None => ()
          }
        }
        l += 1
      }
      if (bestL > 0) score(j) = best
      back(j) = bestL
      j += 1
    }
    if (back(n) == 0) return Vector.empty
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      out = w.substring(p - l, p) :: out
      p -= l
    }
    out.toVector
  }
}
