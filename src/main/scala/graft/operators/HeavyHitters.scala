package graft.operators

/** Misra–Gries heavy-hitters summary — the bounded-memory candidate
  * generator for "keys with frequency above φ·N" when the key
  * cardinality is too large to hash-aggregate in full. Guarantee: any
  * key with more than n/k occurrences in the summarized stream
  * survives the k-counter summary (each decrement round retires k+1
  * occurrences, so a key must be decremented more than n/(k+1) times
  * to die). Per-partition summaries union into a candidate superset of
  * every global key with count > N/k; an exact counting pass over just
  * the candidate keys then removes false positives — the repo's
  * standard "sketch candidates + exact verify ⇒ deterministic result"
  * shape (same doctrine as the LSH families), so the output is
  * byte-identical to the full GROUP BY … HAVING, while the shuffle
  * carries only candidate-key rows instead of the full cardinality. */
object HeavyHitters {

  /** One pass of Misra–Gries with `k` counters. Returns the surviving
    * keys and their (under-)estimates. */
  def misraGries(it: Iterator[Long], k: Int): scala.collection.Map[Long, Long] = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    misraGriesInto(m, it, k)
    m
  }

  /** The same pass CONTINUING from a prior summary `m` (≤ k entries) —
    * the streaming form: a micro-batch's slice folds into GroupState
    * and the result is identical to one pass over the concatenated
    * stream, because the state machine's transition depends only on
    * the current counter map and the next item. */
  def misraGriesInto(m: scala.collection.mutable.LongMap[Long],
      it: Iterator[Long], k: Int): Unit = {
    require(k >= 1, "k must be >= 1")
    it.foreach { x =>
      m.get(x) match {
        case Some(v) => m(x) = v + 1
        case None if m.size < k => m(x) = 1L
        case None =>
          // decrement-all round: amortized O(1) per input item — every
          // decrement cancels one prior increment
          m.mapValuesInPlace((_, v) => v - 1)
          m.filterInPlace((_, v) => v > 0)
      }
    }
  }
}
