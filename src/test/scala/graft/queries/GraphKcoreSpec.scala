package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** k-core decomposition invariants:
  *  - core numbers on a KNOWN-core fixture (K5 clique ∪ triangle with
  *    a pendant path) match the textbook values;
  *  - parity with a classic sequential min-degree peel on random
  *    graphs (the algorithmic ground truth);
  *  - the multi-round case: a long path peels from BOTH ends one
  *    round at a time, pinning that maxPasses budgets ROUNDS, not a
  *    single sweep;
  *  - the corpus fixpoint sits strictly inside the oracle's unrolled
  *    pass budget (raising KcorePasses is the fix if this ever
  *    fires — the analogue of BpeSpec's SqlPasses guard). */
class GraphKcoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("u", "v")
  }

  /** Classic single-machine reference: repeatedly remove a minimum-
    * degree vertex; core(v) = max degree-at-removal seen so far. */
  private def refCores(es: Seq[(Long, Long)]): Map[Long, Int] = {
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.Set[Long]]
    es.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    val core = scala.collection.mutable.HashMap.empty[Long, Int]
    var k = 0
    while (adj.nonEmpty) {
      val (v, ns) = adj.minBy { case (x, ns) => (ns.size, x) }
      k = math.max(k, ns.size)
      core(v) = k
      ns.foreach(w => adj(w) -= v)
      adj.remove(v)
    }
    core.toMap
  }

  private def cores(df: DataFrame, kMax: Int = GraphOps.KcoreMax,
      passes: Int = GraphOps.KcorePasses): Map[Long, Int] =
    GraphOps.coreNumbers(df, kMax, passes).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("known-core fixture: K5 is the 4-core, the triangle is a 2-core, the path is core 1") {
    // K5 on 1..5; triangle 10,11,12 with pendant path 12-13-14
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val es = k5 ++ Seq((10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L), (13L, 14L))
    val got = cores(edgesDf(es))
    val expect = (1L to 5L).map(_ -> 4).toMap ++
      Map(10L -> 2, 11L -> 2, 12L -> 2, 13L -> 1, 14L -> 1)
    assert(got === expect)
  }

  test("distributed peel equals the classic min-degree reference on random graphs") {
    Seq(0xC04E1, 0xC04E2, 0xC04E3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40
      val es = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < 0.08
      } yield (a, b)).toSeq
      val ref = refCores(es)
      // reference can exceed KcoreMax in principle; cap both sides
      val refCapped = ref.view.mapValues(c => math.min(c, GraphOps.KcoreMax)).toMap
      val got = cores(edgesDf(es), passes = n) // generous rounds for the test
      assert(got === refCapped, s"seed 0x${seed.toHexString}")
    }
  }

  test("a path peels one endpoint pair per ROUND — maxPasses budgets rounds") {
    // path 0-1-...-9: 2-core is empty, but each peel round only
    // removes the two current endpoints, so fixpoint needs ~5 rounds
    val es = (0L until 9L).map(i => (i, i + 1))
    val enough = cores(edgesDf(es), passes = 6)
    assert(enough === (0L to 9L).map(_ -> 1).toMap)
    // an under-budgeted peel leaves interior path nodes in the
    // "2-core" — the documented failure mode the budget guards
    val starved = cores(edgesDf(es), passes = 1)
    assert(starved.values.exists(_ == 2),
      "1-pass peel unexpectedly reached the fixpoint — fixture too short")
  }

  test("corpus fixpoint sits inside the oracle's unrolled pass budget") {
    val sf = "/root/testdata/sf0.001"
    val edges = TextOps.simhashPairsForGraph(spark, sf).select("ida", "idb")
    val atBudget = cores(edges)
    val generous = cores(edges, passes = GraphOps.KcorePasses + 5)
    assert(atBudget === generous,
      s"corpus peel not converged within KcorePasses=${GraphOps.KcorePasses} — raise it (and the oracle unroll)")
  }
}
