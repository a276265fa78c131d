package graft.operators

/** Shared in-bucket LSH candidate generation used by the banded
  * near-dup paths whose guarantee is probabilistic (MinHash text LSH,
  * hyperplane vector LSH — TextOps / VectorOps). The SimHash path,
  * whose 4×16-bit pigeonhole guarantee is exact, uses
  * [[SimHashBuckets]] instead: its overflowing buckets sub-split
  * losslessly rather than engage this cap's skip.
  *
  * Members of one (band, bandValue) bucket are grouped by FULL
  * signature first: identical signatures are known matches and expand
  * to pairs directly in band 0 (first-matching-band for equal
  * signatures is always band 0), and the pairwise loop runs over ONE
  * representative per distinct signature, capped at `cap`.
  *
  * Memory contract: O(|bucket|) — the member array and the group index.
  * The emitted pair stream is a LAZY iterator composition; a degenerate
  * bucket (say 1M identical fingerprints → ~5·10^11 pairs) streams
  * through the downstream verification join without ever materializing
  * a pair list on the executor. (Round-4 review flagged the previous
  * ArrayBuffer buffering here as an OOM shape; LshBucketsSpec pins the
  * laziness with a 50k-member degenerate group.)
  *
  * Cap semantics (documented loss mode): when a bucket holds more than
  * `cap` DISTINCT signatures, pairwise compares cover only the first
  * `cap` groups (deterministic: ascending min member id). Because a
  * pair is emitted only in its first matching band, a pair skipped by
  * the cap in that band is NOT retried in later shared bands — the cap
  * trades bounded per-bucket compute (cap² signature compares) for
  * recall on boilerplate-shaped buckets. It is configurable via
  * `spark.graft.lsh.maxBucketGroups` (≤ 0 disables the cap); overflows
  * print a rate-limited stderr note (power-of-two schedule per tag)
  * with the bucket size and running overflow count.
  */
object LshBuckets {

  /** Default cap on distinct signatures compared pairwise per bucket. */
  val DefaultMaxBucketGroups = 4096

  /** Session-configured cap (`spark.graft.lsh.maxBucketGroups`),
    * resolved once at plan-build time and captured into the executor
    * closure. `<= 0` means unlimited. */
  def maxBucketGroups(s: org.apache.spark.sql.SparkSession): Int = {
    val key = "spark.graft.lsh.maxBucketGroups"
    val raw = s.conf.get(key, DefaultMaxBucketGroups.toString)
    val v =
      try raw.trim.toInt
      catch {
        case e: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an integer, got '$raw'", e)
      }
    if (v <= 0) Int.MaxValue else v
  }

  /** Per-tag cap-overflow counters (JVM-wide): a boilerplate-heavy
    * corpus can overflow many buckets in one job, so an unconditional
    * per-bucket stderr note could emit hundreds of thousands of lines.
    * Noted on a power-of-two schedule instead: ≤ ~40 lines per tag
    * however many buckets overflow, with the running count in each
    * line. (SimHashBuckets keeps its own counter with the same
    * schedule for its lossless sub-split events.) */
  private val overflowCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Lazily emit candidate pairs for one bucket.
    *
    * @param band      band index of this bucket (equal-signature pairs
    *                  are emitted only when band == 0)
    * @param members   bucket members as (id, signature), SORTED by id
    *                  ascending (callers sort; ordering makes the cap
    *                  and pair orientation deterministic)
    * @param groupKey  hashable key of the FULL signature (equal key ⇒
    *                  signatures match with certainty)
    * @param cap       max distinct-signature groups compared pairwise
    * @param tag       label for the stderr overflow note
    * @param matchRep  representative-level test: None if the signatures
    *                  don't match or this isn't their first matching
    *                  band; Some(emit) to cross-expand both groups,
    *                  where emit(idLow, idHigh) builds the output row
    *                  (idLow < idHigh) — lets callers carry payload
    *                  computed during the test (e.g. hamming distance)
    * @param equalEmit output row for two members with IDENTICAL
    *                  signatures (ida < idb)
    */
  def pairs[S, O](
      band: Int,
      members: Array[(Long, S)],
      groupKey: S => AnyRef,
      cap: Int,
      tag: String,
      matchRep: (S, S) => Option[(Long, Long) => O],
      equalEmit: (Long, Long) => O): Iterator[O] = {
    if (members.length < 2) return Iterator.empty
    // group member INDICES by full signature; LinkedHashMap keeps
    // first-appearance order = ascending min member id (members sorted)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[AnyRef, scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < members.length) {
      groups.getOrElseUpdate(groupKey(members(i)._2),
        scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    val gs: Array[Array[Int]] = groups.values.map(_.toArray).toArray

    // identical signatures: first matching band is 0 by construction;
    // all within-group pairs are known matches — no signature compares
    val equalPairs: Iterator[O] =
      if (band != 0) Iterator.empty
      else gs.iterator.flatMap { g =>
        if (g.length < 2) Iterator.empty
        else g.indices.iterator.flatMap { x =>
          val ia = members(g(x))._1
          (x + 1 until g.length).iterator.map(y => equalEmit(ia, members(g(y))._1))
        }
      }

    val lim = math.min(gs.length, cap)
    if (gs.length > cap) {
      val n = overflowCounts
        .computeIfAbsent(tag, _ => new java.util.concurrent.atomic.AtomicLong)
        .incrementAndGet()
      if ((n & (n - 1)) == 0L) // 1, 2, 4, 8, … — bounded note volume
        System.err.println(s"[graft] $tag bucket band=$band has ${gs.length} " +
          s"distinct signatures; pairwise compares capped at $cap " +
          s"(spark.graft.lsh.maxBucketGroups); overflow #$n for '$tag' this JVM")
    }

    val crossPairs: Iterator[O] = (0 until lim).iterator.flatMap { gi =>
      val ga = gs(gi)
      val sa = members(ga(0))._2
      (gi + 1 until lim).iterator.flatMap { gj =>
        val gb = gs(gj)
        matchRep(sa, members(gb(0))._2) match {
          case Some(emit) =>
            ga.iterator.flatMap { xi =>
              val ia = members(xi)._1
              gb.iterator.map { yj =>
                val ib = members(yj)._1
                if (ia < ib) emit(ia, ib) else emit(ib, ia)
              }
            }
          case None => Iterator.empty
        }
      }
    }
    equalPairs ++ crossPairs
  }
}
