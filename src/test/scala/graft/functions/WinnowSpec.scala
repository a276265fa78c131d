package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.multimodal.MultimodalOps

class WinnowSpec extends AnyFunSuite {

  test("rolling hashes are position-consistent (true rolling property)") {
    val t = "the quick brown fox jumps over the lazy dog"
    val k = 5
    val rolled = Winnow.rollingHashes(t, k)
    // every position must equal the direct hash of its k-gram
    (0 to t.length - k).foreach { i =>
      val direct = Winnow.rollingHashes(t.substring(i, i + k), k)
      assert(rolled(i) === direct(0), s"at $i")
    }
  }

  test("winnowing: shared substring of length >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(3)
    val k = 5
    val w = 4
    (1 to 30).foreach { _ =>
      def rndStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val shared = rndStr(w + k - 1 + rnd.nextInt(20))
      val a = rndStr(rnd.nextInt(30)) + shared + rndStr(rnd.nextInt(30))
      val b = rndStr(rnd.nextInt(30)) + shared + rndStr(rnd.nextInt(30))
      val fa = Winnow.fingerprints(a, k, w).toSet
      val fb = Winnow.fingerprints(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint for '$shared'")
    }
  }

  test("winnowing is deterministic and short strings degrade gracefully") {
    assert(Winnow.fingerprints("abc", 5, 4).toSeq ===
      Winnow.fingerprints("abc", 5, 4).toSeq)
    assert(Winnow.fingerprints("abc", 5, 4).length === 1)
  }
}

class MultimodalShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("resize emits fixed-size deterministic payloads") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = MultimodalOps.resize(spark, MultimodalOps.docsAsMedia(docs), 64)
      .orderBy("id").collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.getAs[Array[Byte]]("media").length === 64)
      assert(r.getAs[Int]("n_bytes") === 64)
    }
    val again = MultimodalOps.resize(spark, MultimodalOps.docsAsMedia(docs), 64)
      .orderBy("id").collect()
    assert(out.head.getAs[Array[Byte]]("media").toSeq ===
      again.head.getAs[Array[Byte]]("media").toSeq)
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val frames = MultimodalOps.sampleFrames(spark, MultimodalOps.docsAsMedia(docs), 32, 4)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getAs[Array[Byte]]("frame").length === 32)
      assert(r.getAs[Int]("frame_ix") % 4 === 0)
    }
  }
}
