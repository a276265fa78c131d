package graft.functions

/** Tight-loop MinHash kernels (the hot path of dedup_minhash_lsh).
  *
  * Each distinct character 3-gram is hashed once (polynomial base +
  * splitmix64 finalizer); the K permutations derive arithmetically from
  * that one hash — K·|grams| multiply-xor ops per document instead of
  * K·|grams| string hashes, and no per-row array churn. Runs inside
  * mapPartitions: the signature build is a narrow map, nothing
  * shuffles until LSH bucketing.
  */
object MinHash {

  final val Golden = 0x9E3779B97F4A7C15L

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * fnv64(token) — the engine's own codegen'd hash expression
    * ([[Fnv64]]), which a SQL oracle can replicate exactly (pure
    * byte-fold arithmetic, unlike block-based xxhash64). Bit-identical
    * to the interpreted HOF expression `aggregate(sequence(0,63), ...)`
    * it replaces (higher-order functions don't codegen — this kernel is
    * the hot path). Token split matches Spark `split(text, " ")`
    * (trailing empties kept). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = text.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val h = Fnv64.hash(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Distinct char-3gram base hashes of a string (same shingling as the
    * exact-verification gram table: substring(text, i, 3), i = 1..n-2;
    * a short string contributes its single truncated gram). */
  // Gram-hash base: a multiplier larger than any UTF-16 unit (the FNV
  // prime) so equal-length grams cannot collide via structured digit
  // deltas (base 131 < Char.MaxValue admitted (x, c+1, d) == (x, c,
  // d+131), which merged distinct grams and skewed the signature's
  // Jaccard estimate vs the exact verifier on non-ASCII text).
  private val GramBase = 0x100000001b3L

  def gramHashes(text: String): Array[Long] = {
    // code-point shingles, consistent with Num.gramSet / SQL substring
    // (UTF-16-unit slices would make the signature estimate a slightly
    // different Jaccard than the exact verifier measures on non-BMP text)
    val cps = text.codePointCount(0, text.length)
    val n = math.max(cps - 2, 1)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    if (cps == text.length) {
      // all-BMP fast path (the common corpus): direct char indexing
      var i = 0
      while (i < n) {
        var h = 0L
        var j = i
        val end = math.min(i + 3, text.length)
        while (j < end) { h = h * GramBase + text.charAt(j); j += 1 }
        val g = splitmix64(h)
        if (seen.add(g)) { out(m) = g; m += 1 }
        i += 1
      }
    } else {
      // one scan builds the code-point start offsets; grams then slice
      // by table lookup (no per-gram offsetByCodePoints re-walks)
      val starts = new Array[Int](cps + 1)
      var ci = 0
      var off = 0
      while (ci < cps) {
        starts(ci) = off
        off += Character.charCount(text.codePointAt(off))
        ci += 1
      }
      starts(cps) = text.length
      var i = 0
      while (i < n) {
        var h = 0L
        var j = starts(i)
        val end = starts(math.min(i + 3, cps))
        while (j < end) { h = h * GramBase + text.charAt(j); j += 1 }
        val g = splitmix64(h)
        if (seen.add(g)) { out(m) = g; m += 1 }
        i += 1
      }
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** K-component MinHash signature from gram base hashes. */
  def signature(grams: Array[Long], k: Int): Array[Long] = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var gi = 0
    while (gi < grams.length) {
      val g = grams(gi)
      var i = 0
      while (i < k) {
        val v = splitmix64(g ^ (i * Golden))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      gi += 1
    }
    sig
  }

  /** Band hashes: fold r consecutive signature components per band. */
  def bandHashes(sig: Array[Long], r: Int, b: Int): Array[Long] = {
    val out = new Array[Long](b)
    var bi = 0
    while (bi < b) {
      var h = 0L
      var j = 0
      while (j < r) {
        h = (h << 7) ^ (h >>> 57) ^ sig(bi * r + j)
        j += 1
      }
      out(bi) = h
      bi += 1
    }
    out
  }

  /** Pack the low byte of each signature component, 8 per long — the
    * shuffle-compact form for in-bucket similarity estimation (byte
    * equality is implied by full-component equality, so filtering on
    * byte matches can only over-approximate: no new false negatives;
    * the +1/256 false-equal rate is absorbed by exact verification). */
  def packBytes(sig: Array[Long]): Array[Long] = {
    val out = new Array[Long]((sig.length + 7) / 8)
    var i = 0
    while (i < sig.length) {
      out(i >> 3) |= (sig(i) & 0xffL) << ((i & 7) << 3)
      i += 1
    }
    out
  }

  /** Count byte-equal components of two packed signatures, early-exit
    * once `minMatches` is unreachable; returns -1 on early exit. */
  def packedMatches(a: Array[Long], b: Array[Long], k: Int, minMatches: Int): Int = {
    var eq = 0
    var i = 0
    while (i < k) {
      val shift = (i & 7) << 3
      if (((a(i >> 3) >>> shift) & 0xffL) == ((b(i >> 3) >>> shift) & 0xffL)) eq += 1
      else if (eq + (k - i - 1) < minMatches) return -1
      i += 1
    }
    eq
  }

  /** Fraction of equal components with early exit below `minMatches`. */
  def sigMatches(a: Array[Long], b: Array[Long], minMatches: Int): Int = {
    val k = a.length
    var eq = 0
    var i = 0
    while (i < k) {
      if (a(i) == b(i)) eq += 1
      else if (eq + (k - i - 1) < minMatches) return -1
      i += 1
    }
    eq
  }
}
