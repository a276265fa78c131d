package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine-exact fixed-point log2 kernel behind
  * pipe_dsir_weights: exact on powers of two, within 2^-19-ish of libm
  * across the domain, monotone non-decreasing in the rational argument
  * (floor truncation can tie, never invert), and loud outside the
  * documented range. */
class FixedLogSpec extends AnyFunSuite {
  import FixedLog.{log2Fixed, FracUnit}

  test("exact on powers of two") {
    assert(log2Fixed(1, 1) === 0L)
    assert(log2Fixed(2, 1) === FracUnit)
    assert(log2Fixed(1, 2) === -FracUnit)
    assert(log2Fixed(1024, 1) === 10 * FracUnit)
    assert(log2Fixed(1, 1024) === -10 * FracUnit)
    assert(log2Fixed(BigInt(1) << 40, 1) === 40 * FracUnit)
  }

  test("within 2^-19 of the analytic log2 across random rationals") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val num = BigInt(rnd.nextLong(1000000000000L) + 1)
      val den = BigInt(rnd.nextLong(1000000000000L) + 1)
      val got = log2Fixed(num, den).toDouble / FracUnit
      val want = (math.log(num.toDouble) - math.log(den.toDouble)) / math.log(2.0)
      assert(math.abs(got - want) < 4e-6,
        s"log2($num/$den): got $got want $want")
    }
  }

  test("monotone non-decreasing in the rational value") {
    val rnd = new scala.util.Random(7)
    val ratios = (1 to 500).map { _ =>
      (BigInt(rnd.nextInt(1000000) + 1), BigInt(rnd.nextInt(1000000) + 1))
    }.sortBy { case (n, d) => n.toDouble / d.toDouble }
    ratios.sliding(2).foreach {
      case Seq((n1, d1), (n2, d2)) =>
        assert(log2Fixed(n1, d1) <= log2Fixed(n2, d2),
          s"order inverted between $n1/$d1 and $n2/$d2")
      case _ =>
    }
  }

  test("loud outside the documented domain") {
    intercept[IllegalArgumentException](log2Fixed(0, 1))
    intercept[IllegalArgumentException](log2Fixed(1, 0))
    intercept[IllegalArgumentException](log2Fixed(1, BigInt(1) << 55)) // below 2^-50
    intercept[IllegalArgumentException](log2Fixed(BigInt(1) << 50, 1)) // ≥ 2^47
  }
}
