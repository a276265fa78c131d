package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.functions.Winnow

/** Pair truth for mm_video_neardup on a constructed duplicate-clip
  * fixture: two videos sharing an ALIGNED clip of >= k+w-1 = 3 frames
  * (216 bytes) MUST pair; videos with no shared clip must not; and the
  * frame-grid alignment contract is pinned (a clip shifted off the
  * 72-byte grid hashes to different frames — documented, not hidden).
  * Plus the kernel-level winnow-over-values guarantee. */
class VideoNeardupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val F = 72 // frame bytes (9x8 dHash thumbnail)
  private def frame(rnd: scala.util.Random): String =
    (1 to F).map(_ => (' ' + rnd.nextInt(94)).toChar).mkString

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("vidnd").toString
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val clip = (1 to 3).map(_ => frame(rnd)).mkString // 3 shared frames
    val a = frame(rnd) + frame(rnd) + clip + frame(rnd)
    val b = frame(rnd) + clip + frame(rnd) + frame(rnd)
    val c = (1 to 5).map(_ => frame(rnd)).mkString // unrelated
    // same clip but shifted 10 bytes off the frame grid
    val misaligned = frame(rnd).take(10) + clip + frame(rnd)
    Seq((0L, a), (1L, b), (2L, c), (3L, misaligned))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("aligned 3-frame shared clip pairs; unrelated and misaligned do not") {
    val pairs = PipelineOps.queries("mm_video_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"shared aligned clip missed: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"unrelated video paired: $pairs")
    // the frame-grid alignment contract: an off-grid copy of the same
    // clip produces different per-frame thumbnails, hence no pair —
    // near-dup at clip granularity is alignment-sensitive by design
    // (the scale path for shift-invariance is scene-cut segmentation
    // first, then per-shot fingerprints)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"off-grid clip paired (alignment contract broken): $pairs")
  }

  test("fingerprintsLongs: shared aligned run of >= w+k-1 values shares a fingerprint") {
    val rnd = new scala.util.Random(11)
    val k = 2
    val w = 2
    (1 to 50).foreach { _ =>
      def seq(n: Int) = Array.fill(n)(rnd.nextLong())
      val shared = seq(k + w - 1 + rnd.nextInt(5))
      val a = seq(rnd.nextInt(4)) ++ shared ++ seq(rnd.nextInt(4))
      val b = seq(rnd.nextInt(4)) ++ shared ++ seq(rnd.nextInt(4))
      val fa = Winnow.fingerprintsLongs(a, k, w).toSet
      val fb = Winnow.fingerprintsLongs(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty, "no shared fingerprint for shared run")
    }
  }

  test("fingerprintsLongs degrades: < k values -> none, single gram -> its hash") {
    assert(Winnow.fingerprintsLongs(Array(42L), 2, 2).isEmpty)
    assert(Winnow.fingerprintsLongs(Array.emptyLongArray, 2, 2).isEmpty)
    val one = Winnow.fingerprintsLongs(Array(1L, 2L), 2, 2)
    assert(one.length === 1)
    assert(one(0) === Winnow.rollingHashesLongs(Array(1L, 2L), 2)(0))
  }
}
