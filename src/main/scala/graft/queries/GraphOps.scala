package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the order graph (customers ↔ suppliers linked
  * by lineitems) — the iterative-join family beside the
  * ConnectedComponents dedup clustering: PageRank as the canonical
  * "re-shuffle per iteration" workload.
  *
  * Determinism (the kmeans doctrine, VectorOps): every per-edge
  * contribution `r/deg` is snapped to the 2^-20 lattice, so each term
  * is an integer-valued multiple of 2^-20 and the per-node SUM is
  * EXACT and order-independent — Spark's partial aggregation and
  * DuckDB's arbitrary-order SUM produce bit-identical doubles, and the
  * damping arithmetic on top is plain IEEE in both engines. The
  * teleport term is the SCALED formulation: R = pagerank × N, so
  * R₀ = 1 and R' = 0.15 + 0.85·Σ q(R/deg) — the node count N cancels,
  * which keeps query construction job-free (no driver-side count) and
  * the plan join-shape clean (a 1-row N table would need the
  * nested-loop join shape PlanLint forbids).
  *
  * Scale (100 TB): the degree-enriched edge table is built once and
  * lazily truncated via [[graft.operators.Checkpoints.truncate]]
  * (re-read per iteration from block storage — or from reliable
  * checkpoint files under `spark.graft.checkpoint.reliable` — never
  * re-derived through the orders join); each iteration is one
  * equi-join on src and one aggregation shuffle on dst — PageRank's
  * canonical Spark shape, broadcast-free, with map-side partial sums.
  */
object GraphOps extends Serializable {

  private val Q = 1048576.0 // 2^20

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Session memo of the GRAPH EDGE TABLES every graph row re-derived
    * per call (r17, the detect-once-consume-many doctrine extended to
    * the graph inputs): the symmetric order graph feeds
    * pagerank/lpa/modularity/conductance and the simhash pair graph
    * feeds triangles/clustering-coeff/kcore — within one session each
    * previously re-ran its whole derivation (orders⋈lineitem distinct,
    * or corpus fingerprinting + banded pair join) per query. Entries
    * are pinned eager checkpoints exactly like [[lpaLabels]]
    * (pin-before-materialize + [[graft.operators.Checkpoints.buildPinned]]
    * + the shared staleness probe); [[evictGraphEdges]] is the
    * end-of-life hook. Keyed by a `kind` tag so the two tables of one
    * (session, dir) coexist. */
  private val edgeMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  private def memoEdges(s: SparkSession, dir: String, kind: String)(
      build: => DataFrame): DataFrame = {
    graft.operators.Checkpoints.purgeStopped(edgeMemo)(_._1)
    edgeMemo.computeIfPresent((s, dir, kind), { (_, e) =>
      if (!graft.operators.Checkpoints.stale(e)) e
      else { graft.operators.Checkpoints.unpinAndUnpersist(e); null }
    })
    edgeMemo.computeIfAbsent((s, dir, kind), { _ =>
      val df = graft.operators.Checkpoints.pinCheckpointed(build)
      graft.operators.Checkpoints.buildPinned(df) {
        df.count()
        df
      }
    })
  }

  /** Drop the memoized edge tables of (session, dir) — the
    * evictLpaLabels sibling. */
  def evictGraphEdges(s: SparkSession, dir: String): Unit = {
    val it = edgeMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == s && e.getKey._2 == dir) {
        it.remove()
        graft.operators.Checkpoints.unpinAndUnpersist(e.getValue)
      }
    }
  }

  /** The simhash near-dup pair graph as (ida, idb) edges — memoized
    * per session (see [[edgeMemo]]); the derivation (fingerprint +
    * banded pair join) is [[TextOps.simhashPairsForGraph]]. */
  private[graft] def pairGraphEdges(s: SparkSession, dir: String): DataFrame =
    memoEdges(s, dir, "simhash")(
      graft.operators.Checkpoints.truncate(
        TextOps.simhashPairsForGraph(s, dir).select("ida", "idb")))

  /** THE symmetric order-graph edge table — node ids even = customer,
    * odd = supplier (collision-free) — materialized ONCE per session,
    * hash-partitioned on src: downstream branches would otherwise
    * re-derive the whole orders⨝lineitem⨝distinct pipeline, and
    * per-iteration src joins reuse the checkpointed partitioning
    * instead of re-shuffling every iteration. Shared by pagerank and
    * labelProp (review r15 pass 3: a drifted copy would silently skew
    * one query family while the other keeps passing); the oracle-side
    * twin is [[orderEdgesCtes]]. */
  private def symmetricOrderEdges(s: SparkSession, dir: String): DataFrame =
    memoEdges(s, dir, "order") {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.Checkpoints.truncate(
        base.union(base.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(col("src")))
    }

  /** SQL twin of [[symmetricOrderEdges]] (the e0/edges CTE pair). */
  private val orderEdgesCtes: String =
    """e0 AS (
         SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)"""

  /** Scaled PageRank (pr = pagerank × N) on the symmetric
    * customer↔supplier edge set, `iters` damped iterations.
    *
    * Dangling nodes: there are NONE by construction — the edge set is
    * symmetrized (`base ∪ baseᵀ`), so every node with an in-edge has
    * the mirror out-edge and deg ≥ 1 for every rank row; no teleport
    * mass is ever lost (GraphOpsSpec asserts dst ⊆ src on the fixture
    * and pins total-mass conservation). Reusing this kernel on a
    * DIRECTED edge set is NOT supported as-is: dangling nodes (no
    * out-edges) would silently leak their mass each iteration — add
    * the standard dangling-mass redistribution term first. */
  def pagerank(s: SparkSession, dir: String, iters: Int): DataFrame = {
    require(iters >= 1, s"pagerank iters must be >= 1, got $iters")
    val edges0 = symmetricOrderEdges(s, dir)
    val deg = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = graft.operators.Checkpoints.truncate(edges0.join(deg, "src"))
    var ranks = deg.select(col("src"), lit(1.0).as("r"))
    (1 to iters).foreach { _ =>
      ranks = edges.join(ranks, "src")
        .select(col("dst"), expr(s"round(r / deg * ${Q}d) / ${Q}d").as("c"))
        .groupBy("dst")
        .agg((lit(0.15) + lit(0.85) * sum(col("c"))).as("r"))
        .withColumnRenamed("dst", "src")
    }
    ranks.select(col("src").as("node"), round(col("r"), 8).as("pr"))
      .orderBy("node")
  }

  /** Degree-oriented (compact-forward) triangle listing. Input: an
    * undirected distinct edge table (u, v) with u < v. Each edge is
    * ORIENTED from its lower-(deg, id) endpoint to the higher; wedges
    * are enumerated at their lowest-ordered vertex (two oriented
    * out-edges) and closed by a semi join against the oriented edge
    * between the two wedge tips — each triangle is found exactly once,
    * at its minimum-(deg, id) corner.
    *
    * Why orient by DEGREE instead of the id order the input already
    * has: the wedge join fans out quadratically in the max OUT-degree,
    * and id-orientation leaves hub vertices (present in real dedup
    * graphs: one template document near-duplicating thousands) with
    * out-degree ≈ their full degree. Degree-orientation bounds every
    * out-degree by O(√m) (a vertex keeps an out-edge only toward
    * HIGHER-degree endpoints, and there can only be √(2m) vertices of
    * degree ≥ √(2m)), so the wedge stage is O(m^1.5) worst-case and
    * arboricity-bounded in practice — the standard distributed
    * triangle bound. GraphTrianglesSpec pins parity with a naive
    * closed-form count on random graphs including a star + hub
    * fixture where id-orientation would wedge quadratically. */
  def triangles(edges: DataFrame): DataFrame = {
    // the edge table feeds FIVE consumers (two deg joins, two wedge
    // sides, the closing-edge semi join) — truncate once so an
    // expensive upstream (the simhash pair generation) never
    // re-executes per branch (review r14 pass 3)
    val p = graft.operators.Checkpoints.truncate(edges.toDF("u", "v"))
    val deg = p.select(col("u").as("x")).union(p.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val pd = p
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    // u < v throughout, so lexicographic (deg, id) order reduces to
    // du <= dv (ties break toward the smaller id, which is u)
    val oriented = pd.select(
      when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("src"),
      when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("dst"),
      when(col("du") <= col("dv"), col("dv")).otherwise(col("du")).as("ddst"))
    val e1 = oriented.select(col("src"), col("dst").as("b1"), col("ddst").as("db1"))
    val e2 = oriented.select(col("src"), col("dst").as("b2"), col("ddst").as("db2"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("db1") < col("db2") ||
        (col("db1") === col("db2") && col("b1") < col("b2")))
    // the closing edge for tips ordered (db1,b1) < (db2,b2) is, by the
    // same orientation rule, exactly (src=b1, dst=b2)
    val closed = wedges.join(
      oriented.select(col("src").as("b1"), col("dst").as("b2")),
      Seq("b1", "b2"), "left_semi")
    closed
      .select(array_sort(array(col("src"), col("b1"), col("b2"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
      .orderBy("a", "b", "c")
  }

  /** Local clustering coefficient per node: 2·T(v) / (deg·(deg−1)),
    * 0 for deg < 2 — the per-node "how clique-like is this
    * neighborhood" signal on top of [[triangles]] (a near-1 coeff
    * inside a dedup cluster says template duplication; near-0 with
    * high degree says hub contamination). Triangle counts come from
    * the degree-oriented listing (each triangle credits its three
    * corners via one explode), degrees from the edge endpoints — two
    * aggregations and a left join, every stage keyed on node. The
    * coefficient is an exact integer ratio through one double
    * division — cross-engine deterministic, rounded for display. */
  def clusteringCoeff(edges: DataFrame): DataFrame = {
    // truncated here AND inside triangles: the second checkpoint is a
    // cheap re-materialization of already-local blocks, while skipping
    // either would re-run the upstream pair generation per branch
    val p = graft.operators.Checkpoints.truncate(edges.toDF("u", "v"))
    val deg = p.select(col("u").as("node")).union(p.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val triCnt = triangles(p)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(triCnt, Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("coeff", when(col("deg") < 2, lit(0.0))
        .otherwise(round(col("n_tri") * 2 / (col("deg") * (col("deg") - 1)), 6)))
      .select("node", "deg", "n_tri", "coeff")
      .orderBy("node")
  }

  /** Synchronous label propagation (`graph_lpa`, Raghavan et al.
    * 2007) over the symmetric order graph: every node starts as its
    * own label and each iteration adopts the most frequent label
    * among its neighbors PLUS ITSELF (the self-preference vote that
    * damps the bipartite-graph oscillation plain sync LPA suffers),
    * ties to the SMALLEST label — a complete deterministic rule, so
    * a fixed iteration count is oracle-unrollable exactly like
    * pagerank. Each iteration is one src-join on the checkpointed
    * edges + two node-keyed aggregations (vote counts, then the
    * argmax via a (cnt, −lbl) struct max — no per-node window).
    * Labels are node ids (longs ≥ 0), so −lbl is a safe tie-break
    * encoding. */
  def labelProp(s: SparkSession, dir: String, iters: Int): DataFrame = {
    require(iters >= 1, s"lpa iters must be >= 1, got $iters")
    lpaLabels(s, dir, iters)
  }

  /** The LPA loop over any symmetric (src, dst) edge table. */
  private[graft] def labelPropOn(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    (1 to iters).foreach { _ =>
      val votes = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("lbl"))
        .unionByName(labels.select(col("node"), col("lbl")))
      labels = graft.operators.Checkpoints.truncate(
        votes.groupBy("node", "lbl").agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("lbl")))
    }
    labels.select(col("node"), col("lbl").as("community")).orderBy("node")
  }

  /** Session-scoped memo of the LPA community labels on the order
    * graph — the tfStage doctrine applied to graph analytics: the
    * labels are an ANALYSIS ARTIFACT (detect once, grade/consume
    * many), and within one session `graph_lpa` and `graph_modularity`
    * would otherwise each pay the full iteration loop for the SAME
    * deterministic result. The memoized frame is the final
    * iteration's checkpoint (node-count-sized), PINNED against
    * blanket sweeps and materialized eagerly so its lineage
    * truncation can never race a sweep of the intermediate
    * iterations' blocks. */
  private val lpaMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), DataFrame]()

  private def lpaLabels(s: SparkSession, dir: String, iters: Int): DataFrame = {
    graft.operators.Checkpoints.purgeStopped(lpaMemo)(_._1)
    // staleness probe — an externally-unpersisted entry is rebuilt,
    // not served (the shared Checkpoints.stale rule)
    lpaMemo.computeIfPresent((s, dir, iters), { (_, entry) =>
      if (!graft.operators.Checkpoints.stale(entry)) entry
      else { graft.operators.Checkpoints.unpinAndUnpersist(entry); null }
    })
    lpaMemo.computeIfAbsent((s, dir, iters), { _ =>
      // pin BEFORE materializing (the tfStage order): registration
      // happens at the localCheckpoint CALL, so the pin is already
      // effective — pinning after count() left a window where a
      // concurrent blanket sweep could drop the final un-pinned
      // checkpoint and memoize an unrecoverable frame (review r16)
      val labels = graft.operators.Checkpoints.pinCheckpointed(
        labelPropOn(symmetricOrderEdges(s, dir), iters))
      // materialize before the intermediates can be swept, under the
      // shared unpin-on-failure guard (computeIfAbsent stores no entry
      // on throw, so an orphaned pin would be unreachable forever)
      graft.operators.Checkpoints.buildPinned(labels) {
        labels.count()
        labels
      }
    })
  }

  /** Drop the memoized community labels of (session, dir) — the
    * evictTfStage sibling (unpin + release blocks; next call
    * rebuilds). */
  def evictLpaLabels(s: SparkSession, dir: String): Unit = {
    val it = lpaMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == s && e.getKey._2 == dir) {
        it.remove()
        graft.operators.Checkpoints.unpinAndUnpersist(e.getValue)
      }
    }
  }

  /** Modularity (Newman's Q) of the LPA communities — the quality
    * score that closes the detect→cluster→grade loop exactly like
    * `vec_recall_eval` grades the ANN path (VERDICT r15 #3):
    *
    *   Q = Σ_c [ e_c/m − (deg_c / 2m)² ]
    *     = Σ_c (int_deg_c · m2 − deg_sum_c²) / m2²
    *
    * with m2 = 2m the DIRECTED edge count of the symmetric table,
    * int_deg_c the directed same-community edge count (= 2·e_c), and
    * deg_sum_c the community's degree mass. One src-label join + one
    * dst-label join + two community-keyed aggregations — every
    * shuffle keys on node or community. The numerator is EXACT
    * BIGINT arithmetic summed exactly in both engines, finished by a
    * single double division (cross-engine bit-identical; |num| ≤
    * 2·m2² keeps int64 safe to ~2·10⁹ directed edges — past that,
    * promote num to DECIMAL, the money-sum doctrine). m2 is a
    * plan-time scalar (the a12-bloom bounded tier; a constant-key
    * join would constant-fold into BroadcastNestedLoopJoin).
    *
    * Output: one row per community (n_nodes, deg_sum, int_deg, q
    * contribution) plus the global row under community = −1 whose `q`
    * IS the modularity. */
  def modularity(s: SparkSession, dir: String, iters: Int): DataFrame = {
    val (stats, m2) = communityStats(s, dir, iters)
    val per = stats.withColumn("num",
      expr(s"int_deg * ${m2}L - deg_sum * deg_sum"))
    val total = per.agg(
        sum(col("n_nodes")).as("n_nodes"), sum(col("deg_sum")).as("deg_sum"),
        sum(col("int_deg")).as("int_deg"), sum(col("num")).as("num"))
      .select(lit(-1L).as("community"), col("n_nodes"), col("deg_sum"),
        col("int_deg"), col("num"))
    per.select("community", "n_nodes", "deg_sum", "int_deg", "num")
      .unionByName(total)
      .withColumn("q", round(
        col("num").cast("double") / lit((m2 * m2).toDouble), 6))
      .select("community", "n_nodes", "deg_sum", "int_deg", "q")
      .orderBy("community")
  }

  /** Per-community structural stats under the memoized LPA labels —
    * (community, n_nodes, deg_sum, int_deg) + the directed edge count
    * m2: one src-label join + one dst-label join + two community-keyed
    * aggregations, the shared detect→grade stage of [[modularity]]
    * and [[conductance]]. */
  private def communityStats(s: SparkSession, dir: String,
      iters: Int): (DataFrame, Long) = {
    // symmetricOrderEdges is already checkpointed (one truncation for
    // its three consumers here: the m2 count materializes the blocks
    // the two stat branches then read — review r16 pass 2 removed a
    // redundant SECOND truncate this site briefly added)
    val edges = symmetricOrderEdges(s, dir)
    val lab = lpaLabels(s, dir, iters)
    val m2 = edges.count()
    val la = lab.select(col("node").as("src"), col("community").as("ca"))
    val lb = lab.select(col("node").as("dst"), col("community").as("cb"))
    val din = edges.join(la, "src").join(lb, "dst")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("int_deg"))
    val per = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(la, "src")
      .groupBy(col("ca").as("community"))
      .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
      .join(din, Seq("community"), "left")
      .withColumn("int_deg", coalesce(col("int_deg"), lit(0L)))
    (per, m2)
  }

  /** Conductance φ(S) = cut(S) / min(vol(S), 2m − vol(S)) per LPA
    * community — the second community-quality metric (Kannan/Vempala/
    * Vetta 2004's cluster criterion): LOW conductance = a well-
    * separated cluster, the complement view to modularity's global Q.
    * Every quantity derives from the SAME shared per-community stats:
    * cut = deg_sum − int_deg (directed out-edges minus internal),
    * vol = deg_sum. Exact BIGINTs finished by one rounded double
    * division; the whole-graph community (denominator 0 — no cut
    * possible) scores 0 by convention in both engines. */
  def conductance(s: SparkSession, dir: String, iters: Int): DataFrame = {
    val (stats, m2) = communityStats(s, dir, iters)
    stats
      .withColumn("cut", col("deg_sum") - col("int_deg"))
      .withColumn("denom", least(col("deg_sum"), lit(m2) - col("deg_sum")))
      .withColumn("phi", when(col("denom") === 0L, lit(0.0))
        .otherwise(round(col("cut").cast("double") / col("denom").cast("double"), 6)))
      .select(col("community"), col("n_nodes"), col("deg_sum").as("vol"),
        col("cut"), col("phi"))
      .orderBy("community")
  }

  /** One k-peel to fixpoint: repeatedly drop nodes with degree < k
    * (and their edges) until nothing changes — what survives is the
    * k-core. Each pass is one endpoint-union aggregation + two semi
    * joins, all keyed on node id; lineage is truncated per pass and
    * the fixpoint check is a bounded count (the CC driver-loop tier).
    * `maxPasses` bounds the rounds — peel depth is diameter-bounded
    * (a k=2 path graph peels one endpoint pair per round), so a
    * production run caps it and GraphKcoreSpec guards that the corpus
    * fixpoint sits far inside the oracle's unrolled pass budget. */
  private[graft] def kcorePeel(edges: DataFrame, k: Int,
      maxPasses: Int): DataFrame = {
    var cur = graft.operators.Checkpoints.truncate(edges.toDF("u", "v"))
    var n = cur.count()
    var pass = 0
    var done = n == 0L
    while (!done && pass < maxPasses) {
      pass += 1
      val keep = cur.select(col("u").as("x")).union(cur.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("x")
      val nxt = graft.operators.Checkpoints.truncate(
        cur.join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("x").as("v")), Seq("v"), "left_semi")
          .select("u", "v"))
      val m = nxt.count()
      done = m == n
      cur = nxt
      n = m
    }
    cur
  }

  /** k-core decomposition (`graph_kcore`): every node's core number —
    * the largest k for which it survives the k-peel — the standard
    * dedup-cluster QA signal after triangles/clustering coefficient
    * (core ≥ 3 inside a near-dup graph says dense template
    * duplication; core 1 says pendant chaff). Peels CHAIN: the k-core
    * is a subgraph of the (k−1)-core, so each level starts from the
    * previous level's survivors instead of the full graph. The oracle
    * unrolls the same chained peels as CTE stages with a fixed pass
    * budget per level (the pagerank unrolled-iteration doctrine;
    * extra passes past the fixpoint are idempotent). */
  def coreNumbers(edges: DataFrame, kMax: Int, maxPasses: Int): DataFrame = {
    val p = graft.operators.Checkpoints.truncate(edges.toDF("u", "v"))
    // k = 1 survivors are ALL edge-incident nodes (edge membership
    // means degree >= 1); higher cores chain from each survivor set
    var lvl = p
    var tiers = Vector((1,
      p.select(col("u").as("doc_id")).union(p.select(col("v").as("doc_id")))))
    (2 to kMax).foreach { k =>
      lvl = kcorePeel(lvl, k, maxPasses)
      tiers = tiers :+ ((k,
        lvl.select(col("u").as("doc_id")).union(lvl.select(col("v").as("doc_id")))))
    }
    tiers.map { case (k, nodes) => nodes.withColumn("k", lit(k)) }
      .reduce(_.unionByName(_))
      .groupBy("doc_id").agg(max(col("k")).cast("int").as("core"))
      .orderBy("doc_id")
  }

  /** Iteration count surfaced in the registry (VERDICT r12 #7):
    * `spark.graft.pagerank.iters`, default 3 — the oracle SQL unrolls
    * exactly 3, so the gate runs the default; the conf is the tuning
    * knob for ad-hoc use (more iterations = same plan, repeated). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) =>
      pagerank(s, dir, s.conf.get("spark.graft.pagerank.iters", "3").toInt)),
    // mutual near-duplicate triples on the simhash pair graph — the
    // clique-ish structure a dedup-cluster QA pass looks for
    "graph_triangles" -> ((s, dir) =>
      triangles(pairGraphEdges(s, dir))),
    "graph_clustering_coeff" -> ((s, dir) =>
      clusteringCoeff(pairGraphEdges(s, dir))),
    // core numbers up to KcoreMax with KcorePasses peel rounds per
    // level — constants shared with the unrolled oracle; the engine
    // stops each level at its fixpoint (extra oracle passes are
    // idempotent) and GraphKcoreSpec guards both budgets vs the corpus
    "graph_kcore" -> ((s, dir) =>
      coreNumbers(pairGraphEdges(s, dir),
        KcoreMax, KcorePasses)),
    // community detection on the order graph — the oracle unrolls the
    // default iteration count (the pagerank doctrine); labels come
    // from the session-scoped memo shared with graph_modularity
    "graph_lpa" -> ((s, dir) =>
      labelProp(s, dir,
        s.conf.get("spark.graft.lpa.iters", LpaIters.toString).toInt)),
    // grade the detected communities — Newman's Q over the SAME
    // memoized labels (detect→cluster→score, the vec_recall_eval
    // composition doctrine)
    "graph_modularity" -> ((s, dir) =>
      modularity(s, dir,
        s.conf.get("spark.graft.lpa.iters", LpaIters.toString).toInt)),
    // the second grade over the same memoized labels: per-community
    // separation (conductance), completing detect→cluster→score with
    // both a global (Q) and a per-cluster (φ) quality signal
    "graph_conductance" -> ((s, dir) =>
      conductance(s, dir,
        s.conf.get("spark.graft.lpa.iters", LpaIters.toString).toInt)))

  private[graft] val KcoreMax = 4
  private[graft] val KcorePasses = 6
  /** LPA default iteration count — the SAME constant drives the
    * registry default and the oracle's unroll depth (the
    * KcoreMax/KcorePasses pattern; GraphOpsSpec pins the contract). */
  private[graft] val LpaIters = 3

  private def iterSql(i: Int): String =
    s"""r$i AS (
          SELECT e.dst AS node,
                 0.15e0 + 0.85e0 * SUM(round(r.r / d.deg * 1048576) / 1048576.0e0) AS r
          FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON d.src = e.src
          GROUP BY e.dst)"""

  /** SQL twin of [[coreNumbers]]: the chained k-peels unrolled as
    * keep/edge CTE stages (KcorePasses per level — idempotent past
    * the fixpoint, the multi-pass-replace argument in reverse:
    * dropping nothing twice drops nothing). */
  private def kcoreSql(kMax: Int, passes: Int): String = {
    val stages = (2 to kMax).flatMap { k =>
      val base = if (k == 2) "p" else s"c${k - 1}_$passes"
      (1 to passes).flatMap { j =>
        val prev = if (j == 1) base else s"c${k}_${j - 1}"
        Seq(
          s"""k${k}_$j AS (
              SELECT x FROM (SELECT u AS x FROM $prev UNION ALL SELECT v FROM $prev)
              GROUP BY x HAVING count(*) >= $k)""",
          s"""c${k}_$j AS MATERIALIZED (
              SELECT u, v FROM $prev
              WHERE u IN (SELECT x FROM k${k}_$j) AND v IN (SELECT x FROM k${k}_$j))""")
      }
    }
    val tiers =
      "SELECT u AS doc_id, 1 AS k FROM p UNION ALL SELECT v, 1 FROM p" +:
        (2 to kMax).map(k =>
          s"UNION ALL SELECT u, $k FROM c${k}_$passes UNION ALL SELECT v, $k FROM c${k}_$passes")
    s"""WITH ${OracleSql.simhashCte},
        p AS MATERIALIZED (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM sim a JOIN sim b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        ${stages.mkString(",\n")}
        SELECT doc_id, CAST(max(k) AS INT) AS core
        FROM (${tiers.mkString(" ")})
        GROUP BY doc_id ORDER BY doc_id"""
  }

  /** LPA iteration i as vote/count/argmax CTEs over l${i-1}. */
  private def lpaIterSql(i: Int): String =
    s"""v$i AS (
          SELECT e.dst AS node, l.lbl FROM edges e JOIN l${i - 1} l ON e.src = l.node
          UNION ALL SELECT node, lbl FROM l${i - 1}),
        c$i AS (SELECT node, lbl, count(*) AS cnt FROM v$i GROUP BY 1, 2),
        l$i AS MATERIALIZED (
          SELECT node, lbl FROM (
            SELECT node, lbl,
                   row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rk
            FROM c$i) t WHERE rk = 1)"""

  def oracle: Map[String, String] = Map(
    "graph_lpa" ->
      s"""WITH $orderEdgesCtes,
          l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
          ${(1 to LpaIters).map(lpaIterSql).mkString(",\n")}
          SELECT node, lbl AS community FROM l$LpaIters ORDER BY node""",
    // the LPA chain + exact-BIGINT per-community numerators finished
    // by one double division (engine twin: GraphOps.modularity);
    // DuckDB SUMs return HUGEINT — CAST before arithmetic/hashing
    "graph_modularity" ->
      s"""WITH $orderEdgesCtes,
          l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
          ${(1 to LpaIters).map(lpaIterSql).mkString(",\n")},
          lab AS (SELECT node, lbl AS community FROM l$LpaIters),
          gl AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM edges),
          din AS (
            SELECT la.community, CAST(count(*) AS BIGINT) AS int_deg
            FROM edges e
            JOIN lab la ON la.node = e.src
            JOIN lab lb ON lb.node = e.dst
            WHERE la.community = lb.community GROUP BY 1),
          dg AS (
            SELECT la.community, CAST(sum(d.deg) AS BIGINT) AS deg_sum,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM (SELECT src, CAST(count(*) AS BIGINT) AS deg
                  FROM edges GROUP BY src) d
            JOIN lab la ON la.node = d.src GROUP BY 1),
          per AS (
            SELECT dg.community, dg.n_nodes, dg.deg_sum,
                   COALESCE(din.int_deg, 0) AS int_deg,
                   COALESCE(din.int_deg, 0) * gl.m2 - dg.deg_sum * dg.deg_sum AS num,
                   gl.m2 AS m2
            FROM dg LEFT JOIN din USING (community) CROSS JOIN gl)
          SELECT community, n_nodes, deg_sum, int_deg,
                 -- + 0.0 normalizes IEEE -0.0 (a tiny negative q
                 -- rounding to zero keeps its sign in DuckDB; Spark's
                 -- BigDecimal round has no signed zero) and is an
                 -- exact identity on every other value
                 round(CAST(num AS DOUBLE) / CAST(m2 * m2 AS DOUBLE), 6) + 0.0 AS q
          FROM per
          UNION ALL
          SELECT CAST(-1 AS BIGINT), CAST(sum(n_nodes) AS BIGINT),
                 CAST(sum(deg_sum) AS BIGINT), CAST(sum(int_deg) AS BIGINT),
                 round(CAST(CAST(sum(num) AS BIGINT) AS DOUBLE)
                       / CAST(any_value(m2) * any_value(m2) AS DOUBLE), 6) + 0.0
          FROM per
          ORDER BY community""",
    // same LPA chain + per-community stats as modularity, finished by
    // the cut/min-volume ratio (whole-graph community → denom 0 → 0.0)
    "graph_conductance" ->
      s"""WITH $orderEdgesCtes,
          l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
          ${(1 to LpaIters).map(lpaIterSql).mkString(",\n")},
          lab AS (SELECT node, lbl AS community FROM l$LpaIters),
          gl AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM edges),
          din AS (
            SELECT la.community, CAST(count(*) AS BIGINT) AS int_deg
            FROM edges e
            JOIN lab la ON la.node = e.src
            JOIN lab lb ON lb.node = e.dst
            WHERE la.community = lb.community GROUP BY 1),
          dg AS (
            SELECT la.community, CAST(sum(d.deg) AS BIGINT) AS deg_sum,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM (SELECT src, CAST(count(*) AS BIGINT) AS deg
                  FROM edges GROUP BY src) d
            JOIN lab la ON la.node = d.src GROUP BY 1),
          per AS (
            SELECT dg.community, dg.n_nodes, dg.deg_sum,
                   dg.deg_sum - COALESCE(din.int_deg, 0) AS cut,
                   least(dg.deg_sum, gl.m2 - dg.deg_sum) AS denom
            FROM dg LEFT JOIN din USING (community) CROSS JOIN gl)
          SELECT community, n_nodes, deg_sum AS vol, cut,
                 CASE WHEN denom = 0 THEN 0.0
                      ELSE round(CAST(cut AS DOUBLE) / CAST(denom AS DOUBLE), 6)
                 END AS phi
          FROM per ORDER BY community""",
    "graph_kcore" -> kcoreSql(KcoreMax, KcorePasses),
    "graph_clustering_coeff" ->
      s"""WITH ${OracleSql.simhashCte},
          p AS (
            SELECT a.doc_id AS ida, b.doc_id AS idb
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
          tri AS (
            SELECT e1.ida AS a, e1.idb AS b, e2.idb AS c
            FROM p e1 JOIN p e2 ON e1.idb = e2.ida
            JOIN p e3 ON e3.ida = e1.ida AND e3.idb = e2.idb),
          nodes AS (SELECT ida AS node FROM p UNION ALL SELECT idb FROM p),
          deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM nodes GROUP BY 1),
          tn AS (
            SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri) GROUP BY 1)
          SELECT d.node, d.deg, coalesce(tn.n_tri, 0) AS n_tri,
                 CASE WHEN d.deg < 2 THEN 0.0
                      ELSE round(2 * coalesce(tn.n_tri, 0) / (d.deg * (d.deg - 1)), 6) END AS coeff
          FROM deg d LEFT JOIN tn USING (node) ORDER BY node""",
    "graph_triangles" ->
      s"""WITH ${OracleSql.simhashCte},
          p AS (
            SELECT a.doc_id AS ida, b.doc_id AS idb
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
          SELECT e1.ida AS a, e1.idb AS b, e2.idb AS c
          FROM p e1 JOIN p e2 ON e1.idb = e2.ida
          JOIN p e3 ON e3.ida = e1.ida AND e3.idb = e2.idb
          ORDER BY a, b, c""",
    "graph_pagerank" ->
      s"""WITH $orderEdgesCtes,
          deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          r0 AS (SELECT src AS node, CAST(1 AS DOUBLE) AS r FROM deg),
          ${iterSql(1)}, ${iterSql(2)}, ${iterSql(3)}
          SELECT node, round(r, 8) AS pr FROM r3 ORDER BY node""")
}
