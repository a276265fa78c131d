package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two contracts of the shared in-bucket LSH pair generator:
  * (1) LAZY emission — a degenerate identical-signature group of 200k
  * members (≈ 2·10^10 pairs) constructs its iterator and yields a
  * prefix instantly, which is impossible with any buffered (ArrayBuffer)
  * emission; (2) exact pair-set semantics — equal-signature group
  * expansion in band 0 only, first-matching-band cross-group emission,
  * deterministic cap on distinct-signature groups. */
class LshBucketsSpec extends AnyFunSuite {

  /** simhash-flavored matchRep over Long fingerprints with 16-bit bands. */
  private def simhashRep(band: Int, kMax: Int): (Long, Long) => Option[(Long, Long) => (Long, Long, Int)] =
    (ha, hb) => {
      val ham = java.lang.Long.bitCount(ha ^ hb)
      if (ham <= kMax) {
        var fb = 0
        while (((ha >>> (fb * 16)) & 0xFFFFL) != ((hb >>> (fb * 16)) & 0xFFFFL)) fb += 1
        if (fb == band) Some((ia, ib) => (ia, ib, ham)) else None
      } else None
    }

  test("degenerate 200k identical-signature group: lazy construction + prefix") {
    val members = Array.tabulate(200000)(i => (i.toLong, 42L))
    // STRUCTURAL laziness pin (wall-clock only as a loose secondary
    // bound): emit throws past the taken prefix, so any buffered
    // emission — which would call emit ~2·10^10 times before take()
    // sees an element — fails deterministically on call #101
    // regardless of machine speed.
    val emits = new java.util.concurrent.atomic.AtomicLong
    val t0 = System.nanoTime()
    val it = LshBuckets.pairs[Long, (Long, Long, Int)](
      band = 0, members, groupKey = java.lang.Long.valueOf(_),
      cap = 4096, tag = "spec", matchRep = simhashRep(0, 3),
      equalEmit = (ia, ib) => {
        if (emits.incrementAndGet() > 100)
          throw new IllegalStateException("eager emission: emit called beyond the taken prefix")
        (ia, ib, 0)
      })
    val prefix = it.take(100).toArray
    val dt = (System.nanoTime() - t0) / 1e9
    assert(emits.get === 100L, s"emit invoked ${emits.get} times for a 100-element prefix")
    assert(dt < 30.0, f"prefix of degenerate group took $dt%.1fs — O(n + prefix) contract broken")
    assert(prefix.length === 100)
    // group expansion order: member 0 against 1, 2, 3, ...
    assert(prefix(0) === ((0L, 1L, 0)))
    assert(prefix(99) === ((0L, 100L, 0)))
    assert(prefix.forall { case (a, b, h) => a < b && h == 0 })
  }

  test("cross-group pairs stream lazily too (two 20k groups at hamming 1)") {
    // two signatures differing in one bit of band 0: first matching
    // band is... band 0 differs, bands 1-3 equal → fb = 1
    val sigA = 0x0101010101010101L
    val sigB = sigA ^ 1L
    val members = Array.tabulate(40000)(i =>
      (i.toLong, if (i % 2 == 0) sigA else sigB)).sortBy(_._1)
    // structural pin, same scheme as above: the wrapped emit throws on
    // call #1001, so buffered cross-group expansion (~4·10^8 pairs)
    // cannot pass; matchRep must run exactly once (one group pair, one
    // representative compare — not per member pair)
    val emits = new java.util.concurrent.atomic.AtomicLong
    val reps = new java.util.concurrent.atomic.AtomicLong
    val rep0 = simhashRep(1, 3)
    val t0 = System.nanoTime()
    val it = LshBuckets.pairs[Long, (Long, Long, Int)](
      band = 1, members, groupKey = java.lang.Long.valueOf(_),
      cap = 4096, tag = "spec",
      matchRep = (a, b) => { reps.incrementAndGet(); rep0(a, b).map(emit => (ia: Long, ib: Long) => {
        if (emits.incrementAndGet() > 1000)
          throw new IllegalStateException("eager emission: emit called beyond the taken prefix")
        emit(ia, ib)
      }) },
      equalEmit = (ia, ib) => (ia, ib, 0))
    val prefix = it.take(1000).toArray
    val dt = (System.nanoTime() - t0) / 1e9
    assert(emits.get === 1000L, s"emit invoked ${emits.get} times for a 1000-element prefix")
    assert(reps.get === 1L, s"matchRep invoked ${reps.get} times for 2 signature groups")
    assert(dt < 30.0, f"cross-group prefix took $dt%.1fs — O(n + prefix) contract broken")
    assert(prefix.length === 1000)
    assert(prefix.forall { case (a, b, h) => a < b && h == 1 })
    // band 1 ≠ 0: no equal-signature expansion here
    assert(prefix.forall { case (a, b, _) => (a % 2) != (b % 2) })
  }

  test("small bucket matches brute force across all bands") {
    val sigs = Array(0x1111L, 0x1111L, 0x1110L, 0x1111L ^ (1L << 20), 0xFFFF_FFFF_FFFFL)
    val members = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val brute = for {
      x <- members.indices; y <- (x + 1) until members.length
      ham = java.lang.Long.bitCount(sigs(x) ^ sigs(y)) if ham <= 3
    } yield (x.toLong, y.toLong, ham)
    // union over all 4 bands: every hamming<=3 pair appears EXACTLY
    // once (in its first matching band)
    val emitted = (0 until 4).flatMap { band =>
      LshBuckets.pairs[Long, (Long, Long, Int)](
        band, members, groupKey = java.lang.Long.valueOf(_),
        cap = 4096, tag = "spec", matchRep = simhashRep(band, 3),
        equalEmit = (ia, ib) => (ia, ib, 0)).toSeq
    }
    assert(emitted.sorted === brute.sorted)
    assert(emitted.size === emitted.distinct.size)
  }

  test("cap skips overflow groups deterministically (ascending min id)") {
    // four distinct signatures, all pairwise hamming 1 in band 0 bits
    val sigs = Array(0L, 1L, 2L, 4L)
    val members = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val emitted = LshBuckets.pairs[Long, (Long, Long, Int)](
      band = 1, members, groupKey = java.lang.Long.valueOf(_),
      cap = 2, tag = "spec",
      // fb for these sigs is always 0 (they differ in band 0); use an
      // always-accept rep to isolate cap behavior
      matchRep = (_, _) => Some((ia, ib) => (ia, ib, -1)),
      equalEmit = (ia, ib) => (ia, ib, 0)).toSeq
    // only groups 0 and 1 (first two by min id) are compared
    assert(emitted === Seq((0L, 1L, -1)))
  }
}
