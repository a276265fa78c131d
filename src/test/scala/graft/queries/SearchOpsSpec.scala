package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** The retrieval stack's invariants beyond the oracle gate:
  * chunk coverage/reconstruction, the ln-free idf's relationship to
  * classic log-idf BM25 (the documented variant trade), and the RRF
  * combiner's arithmetic on hand-built lists. */
class SearchOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("chunking: full coverage, stride overlap, ragged tail, lossless reconstruction") {
    val rows = SearchOps.chunkDocs(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.map(_._1).toSet === docs.keySet, "every doc must chunk (>= 1 chunk each)")
    // the DuckDB oracle's bounded-range idiom caps at 1000 chunks/doc
    // while the Spark side is uncapped (review r14): fail HERE, with a
    // pointer, long before a longer corpus turns that into a
    // mysterious oracle mismatch
    val maxChunks = rows.groupBy(_._1).valuesIterator.map(_.length).max
    assert(maxChunks < 900,
      s"$maxChunks chunks on one doc approaches the oracle's range(0,1000) cap " +
        "— raise gs in SearchOps.oracle(text_chunk) first")
    rows.groupBy(_._1).foreach { case (d, cs) =>
      val toks = docs(d).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong),
        s"doc $d chunk ids not dense")
      sorted.foreach { case (_, g, nTok, chunk) =>
        val expect = toks.slice(g.toInt * 24, g.toInt * 24 + 32)
        assert(chunk === expect.mkString(" "), s"doc $d chunk $g content")
        assert(nTok === expect.length.toLong, s"doc $d chunk $g n_tokens")
      }
      // stride-24/size-32 windows: dropping each chunk's 8-token
      // overlap with its predecessor reconstructs the doc exactly
      val rebuilt = sorted.zipWithIndex.flatMap { case ((_, _, _, chunk), i) =>
        val t = chunk.split(" ", -1)
        if (i == 0) t else t.drop(8)
      }
      assert(rebuilt.toSeq === toks.toSeq, s"doc $d reconstruction")
      // only the last chunk may be ragged
      sorted.dropRight(1).foreach { case (_, g, nTok, _) =>
        assert(nTok === 32L, s"doc $d non-final chunk $g ragged") }
    }
  }

  /** Classic Okapi/Lucene BM25 (k1=1.2, b=0.75, idf=ln((N+1)/(df+0.5)))
    * computed in plain Scala — the log-idf form the rational variant
    * stands in for. */
  private def classicBm25TopK(): Map[Long, Seq[Long]] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq)).toMap
    val tf = docs.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, a) => t -> a.length } }
    val dl = docs.map { case (d, ts) => d -> ts.length }
    val n = docs.size
    val avgdl = dl.values.sum.toDouble / n
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, a) => t -> a.size }
    (0L until 5L).map { q =>
      val qterms = tf(q).keySet
      val scored = docs.keys.filter(_ != q).map { d =>
        val sc = qterms.toSeq.sorted.map { t =>
          tf(d).get(t).fold(0.0) { f =>
            math.log((n + 1.0) / (df(t) + 0.5)) *
              (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
          }
        }.sum
        (d, sc)
      }.toSeq
      q -> scored.sortBy { case (d, sc) => (-sc, d) }.take(10).map(_._1)
    }.toMap
  }

  test("rational-idf BM25 tracks classic log-idf BM25 on the fixture corpus") {
    val rational = SearchOps.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq }
    val classic = classicBm25TopK()
    assert(rational.keySet === classic.keySet)
    // the idf swap is per-term monotone, not a global rank identity —
    // pin the fixture outcome: strong top-10 agreement on every query
    rational.foreach { case (q, rs) =>
      val overlap = rs.toSet.intersect(classic(q).toSet).size
      assert(overlap >= 7, s"query $q: only $overlap/10 overlap with classic BM25")
    }
    // and identical top-1 (the strongest signal must survive the swap)
    rational.foreach { case (q, rs) =>
      assert(rs.head === classic(q).head, s"query $q top-1 differs") }
  }

  test("rational idf preserves the classic idf's df-ordering (monotonicity)") {
    val n = 1000
    def rational(df: Int) = (2.0 * n + 2) / (2 * df + 1)
    def classic(df: Int) = math.log((n + 1.0) / (df + 0.5))
    val dfs = Seq(1, 2, 5, 10, 100, 500, 999)
    dfs.sliding(2).foreach { case Seq(a, b) =>
      assert(rational(a) > rational(b))
      assert(classic(a) > classic(b))
    }
  }

  test("RRF combiner: exact scores, both-lists docs outrank single-list docs at equal ranks") {
    import spark.implicits._
    // query 7: doc 100 is rank 1 in BOTH lists; docs 200/300 rank 2
    // in one list each; doc 400 rank 3 sparse only
    val sp = Seq((7L, 100L, 1), (7L, 200L, 2), (7L, 400L, 3))
      .toDF("query_id", "match_id", "rk")
    val de = Seq((7L, 100L, 1), (7L, 300L, 2))
      .toDF("query_id", "match_id", "rk")
    val out = SearchOps.rrfFuse(sp, de, 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (100L, r6(2.0 / 61), 1),          // in both lists at rank 1
      (200L, r6(1.0 / 62), 2),          // rank-2 ties broken by id
      (300L, r6(1.0 / 62), 3),
      (400L, r6(1.0 / 63), 4)))
  }

  test("corpus stays far inside the phrase oracle's range(1,1024) position cap") {
    // the search_phrase oracle's bounded-range idiom enumerates
    // positions via range(1, 1024) while the Spark posexplode side is
    // uncapped (ADVICE r15): a doc with > 1023 bigram positions would
    // surface as a bare oracle hash mismatch — fail HERE with the
    // bound named instead (the chunkCtes maxChunks<900 doctrine)
    // ALL gate SFs, not just sf0.001 (VERDICT r16 #5a)
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sfn =>
      val maxToks = spark.read.parquet(s"/root/testdata/$sfn/documents.parquet")
        .filter(col("text").isNotNull)
        .select(size(split(col("text"), " ", -1)).as("n"))
        .agg(max(col("n"))).collect()(0).getInt(0)
      assert(maxToks < 900,
        s"a $maxToks-token doc at $sfn approaches the oracle's range(1,1024) position " +
          "cap — raise gs in SearchOps.oracle(search_phrase) first")
    }
  }

  test("shared tf stage survives a blanket persisted-block sweep (pin registry)") {
    // build + memoize + PIN the shared stage
    assert(SearchOps.bm25TopK(spark, sf).count() > 0)
    // the Bench-style sweep: drop every persisted block EXCEPT pins —
    // before the pin registry this made every later tfStage consumer
    // fail (lineage-truncated checkpoint, blocks gone)
    graft.operators.Checkpoints.unpersistUnpinned(spark, blocking = true)
    assert(SearchOps.keywordTopK(spark, sf).count() > 0)
    assert(SearchOps.hybridRrf(spark, sf).count() > 0)
  }

  test("evictTfStage unpins, releases blocks, and the next call rebuilds (ADVICE r15)") {
    import graft.operators.Checkpoints
    val (tf1, n1, s1) = SearchOps.tfStage(spark, sf)
    val ids1 = Checkpoints.checkpointRddIds(tf1)
    assert(ids1.nonEmpty, "tf stage must be a pinned checkpoint")
    assert(ids1.forall(Checkpoints.isPinned(spark.sparkContext, _)))
    SearchOps.evictTfStage(spark, sf)
    // pins removed AND the persisted registration released — a
    // long-lived host can now actually reclaim the stage's blocks
    assert(ids1.forall(id => !Checkpoints.isPinned(spark.sparkContext, id)))
    assert(ids1.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)))
    // next access rebuilds a FRESH checkpoint with identical scalars
    val (tf2, n2, s2) = SearchOps.tfStage(spark, sf)
    assert((n2, s2) === ((n1, s1)))
    assert(Checkpoints.checkpointRddIds(tf2).toSet.intersect(ids1.toSet).isEmpty,
      "rebuild must not serve the evicted checkpoint")
    assert(SearchOps.keywordTopK(spark, sf).count() > 0)
  }

  test("tfStage staleness probe: an externally-unpersisted entry is rebuilt, not served") {
    import graft.operators.Checkpoints
    val (tf1, _, _) = SearchOps.tfStage(spark, sf)
    val ids1 = Checkpoints.checkpointRddIds(tf1)
    // raw unpersist OUTSIDE the pin discipline (external code): the
    // memoized entry is now unrecoverable (lineage truncated) — before
    // the probe, every later consumer in the session failed on it
    ids1.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    val (tf2, _, _) = SearchOps.tfStage(spark, sf)
    assert(Checkpoints.checkpointRddIds(tf2).toSet.intersect(ids1.toSet).isEmpty,
      "stale entry served instead of rebuilt")
    assert(tf2.count() > 0)
    // the dead entry's pins were released, not leaked
    assert(ids1.forall(id => !Checkpoints.isPinned(spark.sparkContext, id)))
  }
}
