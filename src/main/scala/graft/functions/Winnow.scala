package graft.functions

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, public
  * MOSS algorithm): Rabin-style rolling hash over character k-grams,
  * then the minimum hash per sliding window of w consecutive grams.
  * Guarantee: any shared substring of length ≥ w + k - 1 between two
  * documents yields at least one shared fingerprint.
  */
object Winnow {

  final val Base = 1000003L

  /** Rolling hashes of all k-grams (length n-k+1), computed in O(n).
    *
    * Sub-gram contract (n < k): degrades to ONE whole-input hash —
    * a short document still gets a fingerprint. NOTE the twin
    * [[rollingHashesLongs]] deliberately differs: n < k there returns
    * NO grams (a clip shorter than k frames cannot share a
    * frame-gram); don't swap one kernel for the other without
    * re-deciding that edge (ADVICE r16, pinned in VideoNeardupSpec). */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array(MinHash.splitmix64(
      text.foldLeft(0L)((h, c) => h * Base + c)))
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    out(0) = MinHash.splitmix64(h)
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * Base + text.charAt(i)
      out(i - k + 1) = MinHash.splitmix64(h)
      i += 1
    }
    out
  }

  /** k-gram hashes over a sequence of u64 VALUES (not characters) —
    * the generalization winnowing needs when the "symbols" are
    * themselves fingerprints (per-frame perceptual hashes in
    * mm_video_neardup): same polynomial fold (h·Base + v, u64 wrap)
    * plus the splitmix64 finalizer. k is tiny (frame grams), so the
    * direct O(n·k) recompute beats carrying a modular inverse.
    * Fewer values than one gram → no grams (a clip shorter than k
    * frames cannot be shared at gram granularity). */
  def rollingHashesLongs(vals: Array[Long], k: Int): Array[Long] = {
    val n = vals.length
    if (n < k) return Array.emptyLongArray
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i + k <= n) {
      var h = 0L
      var j = i
      while (j < i + k) { h = h * Base + vals(j); j += 1 }
      out(i) = MinHash.splitmix64(h)
      i += 1
    }
    out
  }

  /** Winnowed fingerprints of a u64-value sequence — the same window
    * rule as [[fingerprints]] over [[rollingHashesLongs]] grams.
    * Guarantee: any shared run of ≥ w + k − 1 aligned values yields a
    * shared fingerprint. */
  def fingerprintsLongs(vals: Array[Long], k: Int, w: Int): Array[Long] =
    winnow(rollingHashesLongs(vals, k), w)

  /** Winnowed fingerprint set: min hash of each w-window, rightmost
    * minimum wins ties (the standard robust-winnowing rule), deduped.
    * Hashes are u64 values — the window minimum uses UNSIGNED order
    * (so a SQL oracle over HUGEINT [0,2^64) reproduces the selection). */
  def fingerprints(text: String, k: Int, w: Int): Array[Long] =
    winnow(rollingHashes(text, k), w)

  private def winnow(hs: Array[Long], w: Int): Array[Long] = {
    // strictly fewer hashes than one window: no window exists, degrade
    // to all hashes (hs.length == w has exactly one window and must go
    // through the loop — `<=` here skipped it, returning w hashes
    // instead of the single window minimum)
    if (hs.length < w) return hs.distinct.sorted
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + w <= hs.length) {
      var minIx = i
      var j = i + 1
      while (j < i + w) {
        if (java.lang.Long.compareUnsigned(hs(j), hs(minIx)) <= 0) minIx = j
        j += 1
      }
      seen.add(hs(minIx))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    java.util.Arrays.sort(out)
    out
  }
}
