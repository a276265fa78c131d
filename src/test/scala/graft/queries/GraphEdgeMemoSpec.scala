package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the session-scoped graph edge memo (r17): the order graph and
  * the simhash pair graph are derived ONCE per (session, dir), pinned
  * against blanket sweeps, rebuilt on evict, and the consuming query
  * results are unchanged across all of it. */
class GraphEdgeMemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("edge tables memoize, survive sweeps, evict rebuilds, results stable") {
    GraphOps.evictGraphEdges(spark, sf)
    val tri1 = GraphOps.queries("graph_triangles")(spark, sf).collect().toSeq
    val pr1 = GraphOps.queries("graph_pagerank")(spark, sf).collect().toSeq
    val e1 = GraphOps.pairGraphEdges(spark, sf)
    assert(GraphOps.pairGraphEdges(spark, sf) eq e1, "second access rebuilt")
    // the Bench-style pinned-aware sweep must NOT kill the memo
    graft.operators.Checkpoints.unpersistUnpinned(spark)
    assert(GraphOps.pairGraphEdges(spark, sf) eq e1, "sweep invalidated a pinned memo")
    val tri2 = GraphOps.queries("graph_triangles")(spark, sf).collect().toSeq
    assert(tri2 === tri1, "post-sweep triangles drifted")
    // capture content BEFORE evicting — an evicted lazy checkpoint is
    // unreadable by design (lineage truncated, blocks released)
    val e1Rows = e1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // evict → a fresh instance, same deterministic content
    GraphOps.evictGraphEdges(spark, sf)
    val e2 = GraphOps.pairGraphEdges(spark, sf)
    assert(e2 ne e1, "evict did not rebuild")
    assert(e2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === e1Rows,
      "rebuilt pair graph must be deterministic")
    val pr2 = GraphOps.queries("graph_pagerank")(spark, sf).collect().toSeq
    assert(pr2 === pr1, "post-evict pagerank drifted")
    GraphOps.evictGraphEdges(spark, sf)
  }
}
