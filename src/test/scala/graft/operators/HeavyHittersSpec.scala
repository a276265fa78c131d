package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Misra–Gries guarantee the a14_heavy_hitters candidate
  * stage relies on: ANY key with frequency above n/k survives the
  * k-counter summary, under heavy eviction pressure (key cardinality
  * far above k) and adversarial orderings. */
class HeavyHittersSpec extends AnyFunSuite {

  test("every key with freq > n/k survives; estimates never overcount") {
    val rnd = new scala.util.Random(0x46)
    val k = 64
    // 3 true hitters buried in 5000 distinct noise keys
    val hitters = Seq(1L -> 900, 2L -> 500, 3L -> 300)
    val noise = Seq.fill(8000)(100L + rnd.nextInt(5000))
    val stream = rnd.shuffle(hitters.flatMap { case (id, c) => Seq.fill(c)(id) } ++ noise)
    val n = stream.length
    val exact = stream.groupBy(identity).map { case (x, xs) => x -> xs.length.toLong }
    val summary = HeavyHitters.misraGries(stream.iterator, k)
    assert(summary.size <= k)
    exact.foreach { case (key, cnt) =>
      if (cnt > n / k)
        assert(summary.contains(key), s"key $key with count $cnt > ${n / k} evicted")
    }
    summary.foreach { case (key, est) =>
      assert(est <= exact(key), s"MG overcounted $key: $est > ${exact(key)}")
      assert(est >= exact(key) - n / (k + 1),
        s"MG undercounted $key beyond the n/(k+1) bound")
    }
  }

  test("sorted-adversarial order (all hitters last) still retains them") {
    val k = 16
    val stream = (0 until 2000).map(i => (1000 + i).toLong) ++ Seq.fill(400)(7L)
    val summary = HeavyHitters.misraGries(stream.iterator, k)
    assert(summary.contains(7L), "late-arriving hitter evicted")
  }
}
