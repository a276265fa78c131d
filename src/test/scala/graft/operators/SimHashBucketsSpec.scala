package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Exactness of the recursive hot-bucket sub-splitting
  * ([[SimHashBuckets]], VERDICT r9 task 2): under ANY cap the banded
  * path must emit exactly the brute-force hamming-≤3 pair set, each
  * pair once. Tiny caps force multi-level recursion; the generators
  * build the adversarial shapes — boilerplate clusters (template ± few
  * bit flips), diffs confined to one narrow bit window (the
  * no-progress sibling shape), identical-fingerprint runs, and spread
  * diffs that defeat single-secondary-band splitting. */
class SimHashBucketsSpec extends AnyFunSuite {

  /** Full banded algorithm over fingerprints, mirroring
    * TextOps.simhashPairs' bucket structure (4×16-bit bands,
    * first-matching-band emission), driver-side. */
  private def banded(fps: Seq[(Long, Long)], maxHam: Int, cap: Int): Seq[(Long, Long, Int)] = {
    val buckets = scala.collection.mutable.LinkedHashMap
      .empty[(Int, Long), scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    fps.foreach { case (id, fp) =>
      (0 until 4).foreach { b =>
        buckets.getOrElseUpdate((b, (fp >>> (b * 16)) & 0xFFFFL),
          scala.collection.mutable.ArrayBuffer.empty) += ((id, fp))
      }
    }
    buckets.toSeq.flatMap { case ((band, _), members) =>
      SimHashBuckets.pairs(band, members.sortBy(_._1).toArray, maxHam, cap)
    }
  }

  private def brute(fps: Seq[(Long, Long)], maxHam: Int): Seq[(Long, Long, Int)] =
    for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      ham = java.lang.Long.bitCount(fa ^ fb) if ham <= maxHam
    } yield (ia, ib, ham)

  private def check(fps: Seq[(Long, Long)], cap: Int, label: String): Unit = {
    val expected = brute(fps, 3).sorted
    val got = banded(fps, 3, cap)
    assert(got.size === got.distinct.size, s"$label cap=$cap: duplicate emissions")
    assert(got.sorted === expected, s"$label cap=$cap: pair set differs from brute force")
  }

  test("property: random boilerplate clusters match brute force under forced sub-splitting") {
    Seq(0x51A5, 0xC0DE, 0xF00D).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val fps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var id = 0L
      // 6 templates, each a cluster of 40 docs at 0-4 random bit flips
      (1 to 6).foreach { _ =>
        val template = rnd.nextLong()
        (1 to 40).foreach { _ =>
          var fp = template
          (1 to rnd.nextInt(5)).foreach(_ => fp ^= 1L << rnd.nextInt(64))
          fps += ((id, fp)); id += 1
        }
      }
      // background noise
      (1 to 100).foreach { _ => fps += ((id, rnd.nextLong())); id += 1 }
      // caps from brutal (every bucket splits, deep recursion) to lax
      Seq(2, 3, 7, 64, Int.MaxValue).foreach(cap =>
        check(fps.toSeq, cap, s"seed 0x${seed.toHexString}"))
    }
  }

  test("diffs confined to one narrow window (sibling chunks make no progress)") {
    // 64 fingerprints differing ONLY in bits 20-25: every other chunk
    // of every level sub-buckets them back together, so the recursion
    // must grind free bits down without losing pairs
    val base = 0x0123456789ABCDEFL
    val fps = (0 until 64).map(i => (i.toLong, base ^ ((i.toLong & 0x3F) << 20)))
    Seq(2, 5, Int.MaxValue).foreach(cap => check(fps, cap, "narrow-window"))
  }

  test("spread diffs that defeat a single secondary-band split") {
    // pairs agreeing ONLY on band 0: one diff bit in each of bands
    // 1, 2, 3 — a sub-split keyed on any single other band would lose
    // them; the 4-chunk pigeonhole must not
    val base = 0x5555AAAA5555AAAAL
    val fps = (0 until 32).map { i =>
      val f = base ^ (((i & 1L) << 16) | ((i & 2L) << 32) | ((i & 4L) << 48))
      (i.toLong, f)
    }
    Seq(2, 3, Int.MaxValue).foreach(cap => check(fps, cap, "spread-diffs"))
  }

  test("identical-fingerprint runs emit each pair once, in band 0 only") {
    val fps = (0 until 20).map(i => (i.toLong, 0xDEADBEEFL)) ++
      (20 until 25).map(i => (i.toLong, 0xDEADBEEFL ^ 3L))
    Seq(1, Int.MaxValue).foreach(cap => check(fps, cap, "identical-runs"))
  }

  test("the DataFrame path is cap-invariant on the real fixture") {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    def run(cap: String): Seq[String] = {
      spark.conf.set("spark.graft.lsh.maxBucketGroups", cap)
      try graft.queries.TextOps.queries("dedup_simhash_pairs")(spark, dir)
        .collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.lsh.maxBucketGroups")
    }
    val splits0 = SimHashBuckets.subSplits.get()
    val capped = run("2") // force sub-splitting in every non-trivial bucket
    assert(SimHashBuckets.subSplits.get() > splits0,
      "cap=2 run never sub-split — the capped path was not exercised")
    val uncapped = run("0")
    assert(capped === uncapped)
    assert(uncapped.nonEmpty, "degenerate fixture")
  }
}
