package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The cid-indexed broadcast layout of the probed ANN scorers
  * ([[VectorOps.tablesByList]], VERDICT r14 #1): per corpus row the
  * scorer must do work proportional to the queries PROBING that row's
  * list — never to the total query batch. Pinned at a synthetic
  * 1,000-query batch (the realistic recall-eval load the demo-5 batch
  * hides) with a deterministic probe assignment. */
class ProbeIndexSpec extends AnyFunSuite {

  private val NQ = 1000
  private val NLists = 64
  private val NProbe = 4

  /** Deterministic spread assignment: query q probes lists
    * (q*31+j*7) mod NLists for j < NProbe (31, 7 coprime to 64 ⇒ the
    * per-query lists are distinct and the load spreads). */
  private def probes: Map[Long, Seq[Long]] =
    (0L until NQ).map { q =>
      q -> (0 until NProbe).map(j => ((q * 31 + j * 7) % NLists).toLong)
    }.toMap

  test("byList inverts probes exactly: right members, right tables, nothing else") {
    val byList = VectorOps.tablesByList(probes, (qid, cid) => qid * 10000 + cid)
    // every (qid, cid) probe pair appears exactly once, with ITS table
    probes.foreach { case (qid, cids) =>
      cids.foreach { cid =>
        val hits = byList(cid).filter(_._1 == qid)
        assert(hits.length === 1, s"($qid,$cid) appears ${hits.length} times")
        assert(hits.head._2 === qid * 10000 + cid,
          "table factory not called with the owning (qid, cid)")
      }
    }
    // and nothing beyond the probe pairs: total size is Σ|probes|
    assert(byList.values.map(_.length).sum === NQ * NProbe)
    assert(byList.keySet === probes.values.flatten.toSet)
  }

  test("per-row work is per-list, not per-batch: bound holds at 1k queries") {
    val byList = VectorOps.tablesByList(probes, (qid, _) => qid)
    // the scorer's per-row cost is |byList(cid)| — with a spread
    // assignment this is ~NQ*NProbe/NLists, two orders of magnitude
    // below the flat-scan cost NQ the old layout paid on EVERY row
    val perRow = (0L until NLists).map(cid => byList.getOrElse(cid, Array.empty).length)
    assert(perRow.max <= 2 * NQ * NProbe / NLists,
      s"hot list sees ${perRow.max} queries — assignment not spread")
    assert(perRow.max < NQ / 10,
      "per-row work scales with the total batch — the index regressed to a flat scan")
  }

  test("spark.graft.ann.queryBatch widens the query batch (oracle gates the default)") {
    val spark = graft.sources.SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    def queryCount(): Long = VectorOps.queries("vec_ann_ivf_trained")(spark, sf)
      .select("query_id").distinct().count()
    assert(queryCount() === 5L, "default batch is the oracle-pinned 5")
    spark.conf.set("spark.graft.ann.queryBatch", "12")
    try assert(queryCount() === 12L, "conf did not widen the batch")
    finally spark.conf.unset("spark.graft.ann.queryBatch")
  }

  test("indexed scoring equals the flat per-row scan it replaced") {
    val tbl = (qid: Long, cid: Long) => qid * 1000003L + cid
    val byList = VectorOps.tablesByList(probes, tbl)
    val rows = (0L until 500L).map(id => (id, id % NLists)) // (match_id, cid)
    val indexed = rows.flatMap { case (id, cid) =>
      byList.getOrElse(cid, Array.empty[(Long, Long)]).iterator.collect {
        case (qid, t) if qid != id => (qid, id, t)
      }
    }.toSet
    val flat = rows.flatMap { case (id, cid) =>
      probes.toSeq.collect {
        case (qid, cids) if qid != id && cids.contains(cid) => (qid, id, tbl(qid, cid))
      }
    }.toSet
    assert(indexed === flat)
  }
}
