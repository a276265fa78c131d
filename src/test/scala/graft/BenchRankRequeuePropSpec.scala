package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the severity-ranked requeue selection
  * (VERDICT r20 task 7 / r21 task 10): selection is a partition of the
  * distinct candidate names, capped, worst-first by max severity with
  * deterministic alphabetical ties. Raw ScalaCheck (the scalatestplus
  * bridge is not on the offline classpath); failures surface via the
  * checker's result. */
class BenchRankRequeuePropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val nameGen = Gen.oneOf((0 until 12).map(i => s"q$i"))
  private val candGen = Gen.zip(nameGen, Gen.choose(0.1, 50.0))
  private val candsGen = Gen.listOf(candGen)
  private val maxGen = Gen.choose(0, 10)

  test("selected ++ dropped is the distinct-name set, selected <= max") {
    check(Prop.forAll(candsGen, maxGen) { (cands, max) =>
      val (sel, drop) = Bench.rankRequeue(cands, max)
      val all = sel ++ drop
      all.toSet == cands.map(_._1).toSet &&
        all.size == all.distinct.size &&
        sel.size <= max &&
        (drop.isEmpty || sel.size == max)
    })
  }

  test("worst-first by max severity, alphabetical ties, deterministic") {
    check(Prop.forAll(candsGen, maxGen) { (cands, max) =>
      val sevOf = cands.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).max }
      val (sel, drop) = Bench.rankRequeue(cands, max)
      val ordered = sel.forall(s => drop.forall(d =>
        sevOf(s) > sevOf(d) || (sevOf(s) == sevOf(d) && s < d)))
      ordered && Bench.rankRequeue(cands, max) == ((sel, drop))
    })
  }

  test("equal severities order alphabetically") {
    check(Prop.forAll(Gen.listOfN(6, nameGen), maxGen) { (names, max) =>
      val (sel, drop) = Bench.rankRequeue(names.map(_ -> 2.5), max)
      (sel ++ drop) == names.distinct.sorted
    })
  }
}
