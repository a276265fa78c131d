package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with
  * pointer jumping — the clustering step of near-duplicate
  * deduplication (pairs → duplicate groups → one canonical doc per
  * group).
  *
  * Scale design (100 TB): each round is two shuffles on the id key
  * (neighbor-min join + label-of-label jump); the pointer-jumping step
  * contracts label chains, so convergence is O(log diameter) rounds
  * rather than O(diameter) — near-dup clusters are shallow (most are
  * cliques from a shared source doc), so 2-3 rounds is typical.
  * [[Checkpoints.truncate]] cuts the lineage each round, keeping the
  * plan size constant across iterations (an iterative-join loop
  * otherwise grows the DAG exponentially and overwhelms Catalyst) —
  * executor-local blocks by default, or reliable
  * `setCheckpointDir`-backed files under
  * `spark.graft.checkpoint.reliable=true` (spot/preemptible fleets;
  * the explicit block-freeing below then no-ops and file cleanup is
  * the Spark cleaner's job).
  * The label table is one row per *vertex that appears in a pair* —
  * at 100 TB the near-dup pair set is orders of magnitude smaller than
  * the corpus, so the iteration state is small even when the corpus is
  * not.
  */
object ConnectedComponents {

  /** Hard ceiling on [[localEdgeThreshold]]: 64M symmetric edge rows ≈
    * 1 GiB on the driver (16 B/edge in primitive chunks + the 8 B/edge
    * transient vertex array + union-find map). The conf is clamped
    * here with a warning rather than honored blindly — the threshold
    * bounds EVERY driver-side structure of the fast path, including
    * the LocalRelation result (≤ 2×edges vertex rows), so a runaway
    * value would OOM the driver three different ways. */
  private[operators] val MaxLocalEdgeThreshold: Long = 64L << 20

  /** Edge-count bound under which labels are computed on the driver
    * (union-find over primitive edge arrays) instead of running the
    * iterative loop. A near-dup pair set routinely fits this even
    * when the corpus is enormous — and a handful of sequential Spark
    * rounds costs multiple job latencies that a 16-bytes-per-edge
    * collect does not. The default (1M symmetric edge rows ≈ 16 MB on
    * the driver — a true 16 B/edge: [[runLocal]] collects per-partition
    * primitive Array[Long] chunks, never boxed rows) is a BOUNDED,
    * documented collect in the same doctrine as the IVF centroid pull;
    * corpora whose pair volume exceeds it stay fully distributed.
    * NOTE the same number also bounds the driver-built LocalRelation
    * of results (one (id, lbl) row per distinct vertex, ≤ 2×edges) —
    * raising the conf raises BOTH driver costs, which is why values
    * above [[MaxLocalEdgeThreshold]] are clamped (with a stderr
    * warning) instead of honored. */
  private[operators] def localEdgeThreshold(spark: SparkSession): Long = {
    val key = "spark.graft.cc.localEdgeThreshold"
    val raw = spark.conf.get(key, (1L << 20).toString)
    val parsed =
      try raw.trim.toLong
      catch {
        case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$key must be a long edge count, got '$raw'", e)
      }
    if (parsed > MaxLocalEdgeThreshold) {
      System.err.println(s"[graft] $key=$parsed exceeds the driver-memory " +
        s"sanity ceiling; clamping to $MaxLocalEdgeThreshold (~1 GiB driver)")
      MaxLocalEdgeThreshold
    } else parsed
  }

  /** @param edges undirected edges as (srcCol, dstCol) rows (any other
    *   columns ignored); vertices not in any edge are absent from the
    *   output.
    * @param forceDistributed when true the driver fast path is
    *   bypassed regardless of edge count — the bench/spec hook that
    *   keeps the 100 TB code path (the iterative loop) under a
    *   regression signal even on small fixtures.
    * @return (id, cluster_id) — cluster_id = min vertex id reachable
    *   from id (the component's canonical representative). */
  def run(spark: SparkSession, edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, forceDistributed: Boolean = false): DataFrame = {
    val sc = spark.sparkContext
    // localCheckpoint blocks are only freed when the RDD object is
    // GC'd; a long-running job would accumulate one dead label table
    // per round. Track each checkpoint's RDD ids, plus the union of all
    // live ids, so blocks are freed explicitly once a successor round
    // is materialized — and freed wholesale if any action throws
    // (ADVICE r6: the loop previously leaked on maxIter exhaustion or
    // a mid-round failure). Ids are captured from the checkpointed
    // DataFrame's OWN RDD lineage (walk toRdd's dependency graph,
    // intersect with the persistent-RDD registry) — a getPersistentRDDs
    // keyset delta would also capture blocks a CONCURRENT job in the
    // same SparkContext persisted meanwhile, and the error-path
    // free(allLive) would then unpersist a neighbor job's
    // non-recomputable localCheckpoint blocks (ADVICE r7). The lineage
    // set is additionally restricted to ids persisted DURING mk: a
    // caller-cached input table sits in our lineage too, and freeing it
    // would evict the caller's cache.
    var allLive = Set.empty[Int]
    def checkpointIds(mk: => DataFrame): (DataFrame, Set[Int]) = {
      val pre = sc.getPersistentRDDs.keySet.toSet
      val df = mk
      val persistedNow = sc.getPersistentRDDs.keySet.toSet -- pre
      val seen = scala.collection.mutable.Set.empty[Int]
      def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
        if (seen.add(r.id)) r.dependencies.foreach(d => walk(d.rdd))
      walk(df.queryExecution.toRdd)
      val ids = seen.toSet.intersect(persistedNow)
      allLive ++= ids
      (df, ids)
    }
    // Spark logs a WARN that an unpersisted localCheckpoint cannot be
    // recomputed — expected and benign: blocks are only freed after a
    // later action has fully materialized their successor, so nothing
    // can re-read them.
    def free(ids: Set[Int]): Unit = {
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      allLive --= ids
    }

    // parse the conf BEFORE any job: a malformed value must fail before
    // the symmetrize/checkpoint work, not leak its blocks after it
    val threshold = if (forceDistributed) 0L else localEdgeThreshold(spark)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // the driver fast path collects (Long, Long) — any other id type
    // (or a nullable column) keeps the type-agnostic distributed loop
    val localEligible = threshold > 0L && e.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType && !f.nullable)
    val (sym, symIds) = checkpointIds(
      // lazy: the count below (or the loop's label init) is the
      // checkpoint-materializing action — eager would schedule a
      // second full pass over the edge partitions for the same blocks
      Checkpoints.truncate(
        e.union(e.select(col("dst"), col("src"))).distinct()))
    try {
      if (localEligible && sym.count() <= threshold) {
        try return runLocal(spark, sym)
        finally free(symIds)
      }
      var (labels, labelIds) = checkpointIds(
        Checkpoints.truncate(
          sym.select(col("src").as("id")).distinct()
            .withColumn("lbl", col("id")),
          eager = true))
      // Edge table WITH self-loops (id, id): the per-round neighbor-min
      // aggregate over it then yields min(own lbl, neighbor lbls)
      // DIRECTLY — one groupBy replaces the old neighbor-min join PLUS
      // the labels⋈viaEdges re-attach join, cutting one shuffle join
      // per round (round cost is dominated by per-stage latency, not
      // bytes, at every scale where the label table is small).
      val (symSelf, symSelfIds) = checkpointIds(
        Checkpoints.truncate(
          sym.unionByName(labels.select(col("id").as("src"), col("id").as("dst")))))
      // Convergence signal: labels are per-vertex monotone non-increasing
      // (each round takes a min including the current label), so the
      // label-table sum strictly decreases until fixpoint. DECIMAL(38,0)
      // accumulation is exact at any vertex count / id magnitude where a
      // long sum could overflow. The old per-row `nlbl != lbl` flag
      // needed the previous label carried through the round — the very
      // join the self-loop form removes.
      def lblSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).first().get(0))
          .map(_.asInstanceOf[java.math.BigDecimal])
          .getOrElse(java.math.BigDecimal.ZERO)
      var prevSum: Option[java.math.BigDecimal] = None
      var changed = true
      var iter = 0
      var prevIds = Set.empty[Int]
      while (changed && iter < maxIter) {
        // min label over self ∪ neighbors = least(lbl, neighbor min)
        val cand = symSelf.join(labels, symSelf("dst") === labels("id"))
          .groupBy("src").agg(min("lbl").as("lbl1"))
          .select(col("src").as("id"), col("lbl1"))
        // pointer jump: also adopt the label of my current label
        val l2 = cand.select(col("id").as("jid"), col("lbl1").as("jl"))
        // lazy: the label-sum agg below is the round's single action —
        // it materializes the checkpoint blocks as it runs (eager
        // would cost a second job per round for the same result)
        val (next, nextIds) = checkpointIds(Checkpoints.truncate(
          cand.join(l2, cand("lbl1") === l2("jid"), "left")
            .select(col("id"),
              least(col("lbl1"), coalesce(col("jl"), col("lbl1"))).as("lbl"))))
        val s = lblSum(next)
        changed = !prevSum.contains(s)
        prevSum = Some(s)
        // the agg action materialized `next` — the previous round's label
        // blocks are dead now
        free(prevIds)
        prevIds = labelIds
        labelIds = nextIds
        labels = next
        iter += 1
      }
      require(!changed, s"connected components did not converge in $maxIter rounds")
      free(symSelfIds)
      // result blocks (labelIds) stay; the edge table and the
      // second-to-last round are no longer needed
      free(prevIds)
      free(symIds)
      labels
    } catch {
      // free EVERY still-live checkpoint (including the current label
      // table — it is not the return value on this path) before
      // rethrowing; re-freeing already-freed ids is a no-op
      case t: Throwable => free(allLive); throw t
    }
  }

  /** Driver-side union-find over the (already symmetric, deduped) edge
    * table — linking the larger root under the smaller keeps every
    * root the component's min vertex id, exactly the distributed
    * loop's label semantics (equality pinned by property spec).
    *
    * Memory contract: edges arrive as per-partition primitive
    * Array[Long] chunks ([src, dst, src, dst, …]) — 16 B per symmetric
    * edge on the driver, no boxed Tuple2/Long rows, so the
    * [[localEdgeThreshold]] sizing math is exact. The transient vertex
    * array adds 8 B/edge and the result LocalRelation holds one row
    * per distinct vertex (≤ 2×edges); all three are bounded by the
    * same (clamped) threshold. */
  private def runLocal(spark: SparkSession, sym: DataFrame): DataFrame = {
    import spark.implicits._
    val chunks: Array[Array[Long]] = sym.select("src", "dst").rdd
      .mapPartitions { it =>
        val b = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    chunks.foreach { es =>
      var i = 0
      while (i < es.length) {
        val ra = find(es(i))
        val rb = find(es(i + 1))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        i += 2
      }
    }
    // sym carries both directions, so srcs (even offsets) cover every
    // vertex; sort + in-place dedup keeps this primitive too
    val nPairs = chunks.iterator.map(_.length / 2).sum
    val srcs = new Array[Long](nPairs)
    var k = 0
    chunks.foreach { es =>
      var i = 0
      while (i < es.length) { srcs(k) = es(i); k += 1; i += 2 }
    }
    java.util.Arrays.sort(srcs)
    var w = 0
    var r = 0
    while (r < srcs.length) {
      if (w == 0 || srcs(r) != srcs(w - 1)) { srcs(w) = srcs(r); w += 1 }
      r += 1
    }
    val out = new Array[(Long, Long)](w)
    var i = 0
    while (i < w) { out(i) = (srcs(i), find(srcs(i))); i += 1 }
    out.toSeq.toDF("id", "lbl")
  }
}
