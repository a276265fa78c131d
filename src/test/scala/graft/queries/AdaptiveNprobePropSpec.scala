package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the adaptive probe-width rule (VERDICT
  * r20 task 7 / r21 task 10): a Some(p) answer always expects enough
  * qualifying candidates (safety·k) within the probe budget, p is the
  * MINIMAL such width ≥ base, None fires exactly on the thin-corpus /
  * over-budget conditions, and widening is monotone in selectivity. */
class AdaptiveNprobePropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val selGen = Gen.choose(0.0, 1.0)
  private val listsGen = Gen.choose(1, 500)
  private val avgGen = Gen.choose(1.0, 5000.0)
  private val baseGen = Gen.choose(1, 16)
  private val kGen = Gen.choose(1, 100)

  test("Some(p): expectation reached, minimal >= base, within budget; None names a condition") {
    val safety = VectorOps.AdaptiveSafety
    val frac = VectorOps.AdaptiveMaxProbeFrac
    check(Prop.forAll(selGen, avgGen, listsGen, baseGen, kGen) {
      (sel, avg, nLists, base, k) =>
        VectorOps.adaptiveNprobe(sel, avg, nLists, base, k) match {
          case Some(p) =>
            p >= 1 && p <= nLists &&
              (sel * avg * p >= safety * k || p == nLists) &&
              (p <= base || p >= nLists ||
                sel * avg * (p - 1) < safety * k) &&
              p <= math.max(base.toDouble, frac * nLists) + 1e-9
          case None =>
            val perList = sel * avg
            val thin = perList <= 0.0 || perList * nLists < safety * k
            val over = !thin && math.max(base,
              math.ceil(safety * k / perList).toInt) >
              math.max(base.toDouble, frac * nLists)
            thin || over
        }
    })
  }

  test("monotone: higher selectivity never widens the probe or forces fallback") {
    check(Prop.forAll(selGen, selGen, avgGen, listsGen, baseGen, kGen) {
      (s1, s2, avg, nLists, base, k) =>
        val (lo, hi) = if (s1 <= s2) (s1, s2) else (s2, s1)
        (VectorOps.adaptiveNprobe(lo, avg, nLists, base, k),
          VectorOps.adaptiveNprobe(hi, avg, nLists, base, k)) match {
          case (Some(pLo), Some(pHi)) => pHi <= pLo
          case (Some(_), None) => false
          case _ => true
        }
    })
  }
}
