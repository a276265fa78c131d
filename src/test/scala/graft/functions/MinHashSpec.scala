package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession
import graft.queries.{TextOps, VectorOps}

class MinHashSpec extends AnyFunSuite {

  test("gram hashing is deterministic and shingles like substring(i,3)") {
    val a = MinHash.gramHashes("abcdef")
    val b = MinHash.gramHashes("abcdef")
    assert(a.toSeq === b.toSeq)
    assert(a.length === 4) // abc bcd cde def
    assert(MinHash.gramHashes("ab").length === 1) // truncated single gram
    assert(MinHash.gramHashes("aaaa").length === 1) // aaa deduped
  }

  test("signature similarity estimates Jaccard") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(300)(rnd.nextLong())
    // overlap 80% of grams
    val other = base.take(240) ++ Array.fill(60)(rnd.nextLong())
    val sa = MinHash.signature(base, 128)
    val sb = MinHash.signature(other, 128)
    val eq = sa.zip(sb).count { case (x, y) => x == y }
    val estimate = eq / 128.0
    val trueJ = 240.0 / 360.0 // |∩|/|∪|
    assert(math.abs(estimate - trueJ) < 0.15, s"estimate $estimate vs $trueJ")
  }

  test("identical inputs give identical signatures and band hashes") {
    val g = MinHash.gramHashes("the quick brown fox")
    val s1 = MinHash.signature(g, 128)
    assert(MinHash.bandHashes(s1, 4, 32).toSeq ===
      MinHash.bandHashes(MinHash.signature(g, 128), 4, 32).toSeq)
  }
}

class NumSpec extends AnyFunSuite {
  test("gramHashes shingles by code points and matches gramSet's gram count") {
    // "a𝄞b" = 3 code points → exactly one gram; the BMP fast path and
    // the offset-table path must agree with Num.gramSet cardinality
    assert(MinHash.gramHashes("a𝄞b").length === 1)
    for (s <- Seq("", "a", "ab", "abcd", "abcabc", "café 𝄞 café")) {
      assert(MinHash.gramHashes(s).length === Num.gramSet(s).size, s"text '$s'")
    }
    // structured base-collision class from base 131 must not merge
    // distinct grams: (x, c+1, d) vs (x, c, d+131)
    val g1 = MinHash.gramHashes(new String(Array('x', 2.toChar, 69.toChar)))
    val g2 = MinHash.gramHashes(new String(Array('x', 1.toChar, 200.toChar)))
    assert(g1.head !== g2.head)
  }

  test("gramSet slices by code points (SQL substring parity on non-BMP text)") {
    // "a𝄞b" is 3 code points / 4 UTF-16 units: SQL sees ONE 3-char gram
    val s = "a𝄞b"
    val got = Num.gramSet(s)
    assert(got.size === 1 && got.contains(s))
    // short strings degrade to the text itself
    assert(Num.gramSet("ab").contains("ab"))
    import scala.jdk.CollectionConverters._
    assert(Num.gramSet("abcd").asScala === Set("abc", "bcd"))
  }

  test("roundHalfUp matches Spark Round semantics incl. non-finite inputs") {
    assert(Num.roundHalfUp(2.5, 0) === 3.0)
    assert(Num.roundHalfUp(-2.5, 0) === -3.0)
    assert(Num.roundHalfUp(1.2345675, 6) === 1.234568)
    assert(Num.roundHalfUp(Double.NaN, 6).isNaN)
    assert(Num.roundHalfUp(Double.PositiveInfinity, 6).isPosInfinity)
    assert(Num.round0(2.5) === 3.0 && Num.round0(-2.5) === -3.0)
    assert(Num.round0(2.4) === 2.0 && Num.round0(-2.6) === -3.0)
  }
}

class SimhashExprParitySpec extends AnyFunSuite {
  private lazy val spark = graft.sources.SparkTestSession.spark

  test("JVM simhash64 is bit-identical to the SQL HOF expression") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("the quick brown fox", "a", "", "double  space",
      "trailing space ", "café 𝄞 emoji")
    val viaExpr = texts.toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hashes", expr("transform(toks, t -> fnv64(t))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
           acc | if(aggregate(hashes, 0L,
                     (v, h) -> v + if((shiftright(h, b) & 1L) = 1L, 1L, -1L)) > 0L,
                   shiftleft(1L, b), 0L))"""))
      .select("text", "simhash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(MinHash.simhash64(t) === viaExpr(t), s"text '$t'")
    }
  }
}

class LshParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH near-dup pairs equal the exact ngram-Jaccard result") {
    val exact = TextOps.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = TextOps.queries("dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture corpus should contain near-duplicates")
    assert(lsh === exact)
  }

  test("ANN-LSH results are a subset of brute-force rankings with identical scores") {
    val bf = VectorOps.queries("vec_topk_bruteforce")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 4 planes → 16 buckets: coarse enough that the 500-vector corpus
    // populates the query buckets
    val ann = VectorOps.annLsh(spark, dir, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ann.nonEmpty)
    // every ANN hit that brute force also ranked must carry the same score
    val overlapping = ann.filter(a => bf.contains((a._1, a._2)))
    assert(overlapping.nonEmpty)
    overlapping.foreach { case (q, m, s) =>
      assert(math.abs(bf((q, m)) - s) < 1e-9, s"score mismatch for ($q,$m)")
    }
  }

  test("banded SimHash pairs equal brute-force xor-popcount (pigeonhole is lossless)") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sh = TextOps.simhashes(d)
    val a = sh.select(col("doc_id").as("ida"), col("simhash").as("sha"))
    val b = sh.select(col("doc_id").as("idb"), col("simhash").as("shb"))
    val brute = a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = TextOps.simhashPairs(d, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
  }

  test("IVF ANN recalls most brute-force top-10 with identical scores") {
    val bf = VectorOps.queries("vec_topk_bruteforce")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = VectorOps.queries("vec_ann_ivf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    // probing 4 of ~17 lists must not touch the whole corpus's worth of
    // candidates, and every recalled pair carries the exact cosine
    val hits = ivf.count(a => bf.contains((a._1, a._2)))
    val recall = hits.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
    ivf.filter(a => bf.contains((a._1, a._2))).foreach { case (q, m, s) =>
      assert(math.abs(bf((q, m)) - s) < 1e-9, s"score mismatch for ($q,$m)")
    }
  }
}
