package graft.operators

/** Exact candidate generation for one SimHash band bucket, with
  * RECURSIVE HOT-BUCKET SUB-SPLITTING (VERDICT r9 task 2).
  *
  * The generic [[LshBuckets.pairs]] cap skips overflow groups, and —
  * because a pair is emitted only in its first matching band — a pair
  * skipped in that band is never retried: a documented recall loss.
  * For MinHash that trade is coherent (the banding guarantee is
  * probabilistic anyway, and band hashes live in a 2^64 space); for
  * SimHash it is not: the 4×16-bit pigeonhole guarantee is EXACT, and
  * with only 65,536 buckets per band the cap WILL engage on any
  * boilerplate cluster of more than `cap` distinct fingerprints.
  *
  * Fix: an overflowing bucket is not truncated but SUB-SPLIT. All
  * members of a band-`b` bucket agree on band b's 16 bits; a pair
  * within hamming ≤ 3 differs in at most 3 of the remaining "free"
  * bits. Partition those free bits into 4 sub-chunks: by pigeonhole
  * the pair agrees exactly on at least one sub-chunk, so re-bucketing
  * the group by each sub-chunk's value is candidate-complete — the
  * same argument as the top-level banding, one level down. Recursion
  * continues while a sub-bucket still exceeds the cap; each level
  * removes its chunk from the free set, and a sub-bucket's distinct
  * fingerprints are bounded by 2^|free|, so by the time |free| ≤
  * log2(cap) the pairwise path is forced. Per-pair dedup stays exact
  * via agreement masks: a pair found under sub-chunk k must NOT agree
  * on any earlier sibling chunk (it would be found there first), and
  * those "forbidden agreement" masks accumulate down the path.
  *
  * The pairwise width at every level is ≤ cap², same bound as before;
  * what was a recall cliff is now extra recursion depth. Exactness vs
  * brute force (tiny caps force deep recursion) is property-pinned in
  * SimHashBucketsSpec, and the capped == uncapped identity at corpus
  * scale is the committed SimhashCapProbe artifact.
  */
object SimHashBuckets {

  /** JVM-wide count of sub-split events (local-mode introspection for
    * the probe artifact; executors share the JVM under local[*]). */
  val subSplits = new java.util.concurrent.atomic.AtomicLong

  /** Lazily emit all pairs (idLow, idHigh, hamming) among `members`
    * whose hamming distance is ≤ `maxHam` AND whose first matching
    * 16-bit band is `band` (the caller's bucket band — the global
    * dedup rule). `members` must be sorted by id ascending.
    *
    * @param cap max distinct-fingerprint groups compared pairwise at
    *            one recursion level before sub-splitting engages
    */
  def pairs(band: Int, members: Array[(Long, Long)], maxHam: Int,
      cap: Int): Iterator[(Long, Long, Int)] = {
    // The 4-chunk sub-split pigeonhole is candidate-complete only for
    // hamming <= 3 (4 chunks vs <= 3 differing bits). A caller passing
    // maxHam >= 4 with a finite cap would silently lose pairs once
    // sub-splitting engages, so the exactness precondition is enforced
    // HERE, not one layer away in TextOps (ADVICE r10).
    require(maxHam <= 3 || cap == Int.MaxValue,
      s"SimHashBuckets.pairs: maxHam=$maxHam >= 4 breaks the 4-chunk " +
        "sub-split pigeonhole; disable the cap (Int.MaxValue) or use maxHam <= 3")
    if (members.length < 2) return Iterator.empty
    // group member indices by fingerprint; LinkedHashMap keeps
    // first-appearance order = ascending min member id
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < members.length) {
      groups.getOrElseUpdate(members(i)._2,
        scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    val gs: Array[Array[Int]] = groups.values.map(_.toArray).toArray

    // identical fingerprints: first matching band is 0 by construction
    val equalPairs: Iterator[(Long, Long, Int)] =
      if (band != 0) Iterator.empty
      else gs.iterator.flatMap { g =>
        if (g.length < 2) Iterator.empty
        else g.indices.iterator.flatMap { x =>
          val ia = members(g(x))._1
          (x + 1 until g.length).iterator.map(y => (ia, members(g(y))._1, 0))
        }
      }

    val freeMask = ~(0xFFFFL << (band * 16)) // all bits except this band
    equalPairs ++ rec(members, gs, band, maxHam, cap, freeMask, Nil)
  }

  /** One recursion level over distinct-fingerprint groups `gs`. */
  private def rec(members: Array[(Long, Long)], gs: Array[Array[Int]],
      band: Int, maxHam: Int, cap: Int, freeMask: Long,
      forbidden: List[Long]): Iterator[(Long, Long, Int)] = {

    if (gs.length <= cap || java.lang.Long.bitCount(freeMask) < 4) {
      // pairwise over representatives; expand member cross-products on
      // match. The |free| < 4 guard is load-bearing for exactness, not
      // just termination: fewer than 4 free bits cannot form the 4
      // non-empty chunks the ≤3-diff pigeonhole needs (3 chunks + 3
      // spread diffs would lose the pair) — and ≤ 2^3 distinct
      // fingerprints make the pairwise path trivially cheap anyway.
      return (0 until gs.length).iterator.flatMap { gi =>
        val ga = gs(gi)
        val fa = members(ga(0))._2
        (gi + 1 until gs.length).iterator.flatMap { gj =>
          val gb = gs(gj)
          val fb = members(gb(0))._2
          val x = fa ^ fb
          val ham = java.lang.Long.bitCount(x)
          val keep = ham <= maxHam && {
            var fbd = 0
            while (((x >>> (fbd * 16)) & 0xFFFFL) != 0L) fbd += 1
            fbd == band // global rule: first matching 16-bit band
          } && forbidden.forall(m => (x & m) != 0L) // found at an earlier sibling chunk
          if (!keep) Iterator.empty
          else ga.iterator.flatMap { xi =>
            val ia = members(xi)._1
            gb.iterator.map { yj =>
              val ib = members(yj)._1
              if (ia < ib) (ia, ib, ham) else (ib, ia, ham)
            }
          }
        }
      }
    }

    val n = subSplits.incrementAndGet()
    if ((n & (n - 1)) == 0L) // power-of-two schedule, bounded volume
      System.err.println(s"[graft] simhash bucket band=$band has ${gs.length} " +
        s"distinct fingerprints > cap $cap; sub-splitting on ${java.lang.Long.bitCount(freeMask)} " +
        s"free bits (exact; sub-split #$n this JVM)")

    // partition the free bit positions into 4 nearly-equal chunks
    val bits = (0 until 64).filter(b => (freeMask & (1L << b)) != 0L)
    val chunkMasks = (0 until 4).map { k =>
      val lo = k * bits.length / 4
      val hi = (k + 1) * bits.length / 4
      bits.slice(lo, hi).foldLeft(0L)((m, b) => m | (1L << b))
    }.filter(_ != 0L)

    chunkMasks.indices.iterator.flatMap { k =>
      val mk = chunkMasks(k)
      // sub-bucket the groups by their fingerprint restricted to chunk k
      val sub = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Array[Int]]]
      gs.foreach { g =>
        sub.getOrElseUpdate(members(g(0))._2 & mk,
          scala.collection.mutable.ArrayBuffer.empty[Array[Int]]) += g
      }
      val fb = forbidden ++ chunkMasks.take(k) // dedup vs earlier siblings
      sub.valuesIterator.filter(_.length >= 2).flatMap { sgs =>
        rec(members, sgs.toArray, band, maxHam, cap, freeMask & ~mk, fb)
      }
    }
  }
}
