package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Multi-touch attribution invariants beyond the oracle's row hash:
  * conservation (every attributed conversion distributes exactly 100
  * hundredths) and the U-shape contract. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = graft.SparkEntry.queries("ev_attribution")(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))

  test("conservation: every conversion's credits sum to exactly 100") {
    val sums = rows.groupBy(_._1).map { case (c, rs) => c -> rs.map(_._4).sum }
    assert(sums.nonEmpty)
    sums.foreach { case (c, s) => assert(s === 100, s"conversion $c sums to $s") }
  }

  test("U-shape: n>=3 conversions give first=last=40, middles share 20 with early remainder") {
    val multi = rows.groupBy(_._1).filter(_._2.length >= 3)
    assert(multi.nonEmpty, "fixture has no n>=3 conversions — contract untested")
    multi.foreach { case (c, rs) =>
      val credits = rs.sortBy(_._2).map(_._4) // touch_id order != position order
      val n = credits.length
      assert(credits.count(_ == 40) >= 2, s"conversion $c lacks two 40s")
      val mids = credits.sum - 80
      assert(mids === 20, s"conversion $c middles sum to $mids")
      val base = 20 / (n - 2); val rem = 20 % (n - 2)
      val midCredits = credits.filter(_ != 40)
      // note: a middle touch can coincidentally be 40 only if base+1
      // == 40, impossible for n>=3 (base <= 20)
      assert(midCredits.forall(c0 => c0 == base || c0 == base + 1),
        s"conversion $c middle credits $midCredits not {$base, ${base + 1}}")
      assert(midCredits.count(_ == base + 1) === (if (rem == 0) 0 else rem),
        s"conversion $c remainder distribution")
    }
  }

  test("n=1 and n=2 degenerate forms") {
    val byConv = rows.groupBy(_._1)
    byConv.filter(_._2.length == 1).foreach { case (c, rs) =>
      assert(rs.head._4 === 100, s"single-touch conversion $c") }
    byConv.filter(_._2.length == 2).foreach { case (c, rs) =>
      assert(rs.map(_._4).toSeq === Seq(50, 50), s"two-touch conversion $c") }
  }
}
