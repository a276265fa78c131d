package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the LRU bound of the exact-Jaccard gram-set memo: an
  * adversarial partition streaming pairs over all-distinct docs must
  * keep the cache within its gram budget (previously an unbounded
  * HashMap — corpus-shaped executor memory). */
class GramMemoSpec extends AnyFunSuite {

  private def text(i: Long): String =
    s"document number $i with some moderately long body text " * 3

  test("adversarial all-distinct stream stays within the gram budget") {
    val budget = 10000L
    val memo = new TextOps.GramMemo(budget)
    var maxGrams = 0L
    var maxEntries = 0
    (0L until 2000L).foreach { i =>
      memo.get(i, text(i))
      maxGrams = math.max(maxGrams, memo.cachedGrams)
      maxEntries = math.max(maxEntries, memo.entries)
    }
    val perDoc = graft.functions.Num.gramSet(text(0)).size
    assert(maxGrams <= budget + perDoc,
      s"cache exceeded budget: $maxGrams grams (budget $budget)")
    assert(maxEntries < 2000, "no eviction happened — memo is unbounded")
  }

  test("recently-used entries survive; evicted entries re-shingle correctly") {
    val memo = new TextOps.GramMemo(10000L)
    val g0 = memo.get(0L, text(0))
    // hot entry: touch doc 0 between fillers so LRU keeps it
    (1L until 300L).foreach { i => memo.get(i, text(i)); memo.get(0L, text(0)) }
    assert(memo.get(0L, text(0)) eq g0, "hot entry was evicted despite LRU order")
    // doc 1 was evicted long ago: a fresh (correct) set comes back
    val g1 = memo.get(1L, text(1))
    assert(g1 === graft.functions.Num.gramSet(text(1)))
  }

  test("the two entries of an in-flight pair are never evicted") {
    // budget smaller than two docs' grams: eviction pressure on every get
    val perDoc = graft.functions.Num.gramSet(text(0)).size
    val memo = new TextOps.GramMemo(perDoc + 1L)
    (0L until 50L).foreach { i =>
      val ga = memo.get(2 * i, text(2 * i))
      val gb = memo.get(2 * i + 1, text(2 * i + 1))
      // under a budget below two docs, the map floors at the 2
      // in-flight entries instead of evicting a set mid-comparison
      assert(memo.entries <= 3)
      assert(ga === graft.functions.Num.gramSet(text(2 * i)))
      assert(gb === graft.functions.Num.gramSet(text(2 * i + 1)))
    }
  }
}
