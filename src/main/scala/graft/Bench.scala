package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: representative scale-path queries per operator
  * family, timed end-to-end (plan + execute + count) at
  * SPARK_GRAFT_SF_DIR. Exact O(n²) verification baselines
  * (dedup_ngram_jaccard, vec_neardup_pairs) are deliberately not
  * headline — their scalable counterparts (dedup_minhash_lsh,
  * vec_ann_lsh / vec_topk_bruteforce) are. */
object Bench {

  val headline: Seq[String] = Seq(
    // analytics headliners
    "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q5_local_supplier",
    "tpch_q10_returns", "tpch_q18_big_orders", "tpch_q6_forecast",
    "tpch_q4_order_priority", "tpch_q14_promo", "tpch_q19_disjunctive",
    "tpch_q13_custdist", "tpch_q17_small_qty", "tpch_q21_waiting",
    "tpch_q22_idle_rich", "tpch_q7_volume", "tpch_q8_mktshare",
    "tpch_q15_top_supplier", "a12_bloom_semi", "a14_heavy_hitters",
    // scan / filter / sort
    "q1_agg", "s13_scan_project", "f1_type_filter", "o3_multikey_sort", "o7_zorder_key",
    // joins
    "j1_ref_coord_join", "j1_skew_salted", "j2_star_broadcast", "j6_anti_join", "j7_semi_join",
    // aggregation / window
    "a1_first_last", "a6_group_chain", "w2_run_ids", "o4_dedup_first_wins",
    "r1_pivot",
    // topology
    "g10_topo_segments",
    // text pipeline
    "dedup_exact_hash", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_cluster_cc", "dedup_cluster_cc_dist", "dedup_substring_pairs", "graph_pagerank",
    "text_quality", "text_langid", "text_tokens", "text_fingerprint",
    "text_repetition", "text_doc_freq",
    // vectors
    "vec_topk_bruteforce", "vec_ann_lsh", "vec_ann_ivf", "vec_ann_ivf_trained",
    "vec_ann_pq", "vec_ann_pq_rerank", "vec_ann_ivfpq", "vec_ann_ivfpq_res",
    "vec_ann_sq8", "vec_ann_ivfsq8",
    "vec_neardup_lsh", "vec_kmeans", "vec_semdedup",
    // events / multimodal / integrated pipeline
    "ev_window_agg", "ev_sessionize", "ev_view_click_join", "ev_dedup_first",
    "ev_asof_join", "ev_range_join", "ev_funnel", "ev_retention", "ev_top_paths",
    "ev_anomaly", "ev_sliding_agg", "ev_locf_resample", "ev_attribution",
    "mm_features", "pipe_clean_corpus", "pipe_sample_stratified",
    "pipe_decontaminate", "pipe_pii_mask", "pipe_pack_sequences",
    "text_bpe_tokens", "text_bpe_train", "pipe_pack_sequences_bpe", "text_vocab_topk",
    // retrieval stack: chunking, sparse BM25, hybrid fusion, dedup-graph triangles
    "text_chunk", "search_bm25_topk", "search_hybrid_rrf", "graph_triangles",
    "text_keyword_topk", "graph_clustering_coeff",
    // round-15 additions: trained-tokenizer loop, LM quality filter,
    // k-core QA, RFM grid, positional phrase search, audio resample
    "text_bpe_apply", "pipe_pack_sequences_trained", "text_ngram_ppx",
    "graph_kcore", "ev_rfm", "search_phrase", "mm_audio_resample", "mm_phash_pairs",
    "dedup_chunk_exact", "graph_lpa", "mm_scene_cut",
    // round-16 additions
    "graph_modularity", "pipe_remove_dup_spans", "pipe_full_curation",
    "text_unigram_train", "text_unigram_apply", "mm_video_neardup",
    "text_collocations", "pipe_pack_sequences_unigram", "dedup_chunk_containment",
    "graph_conductance", "pipe_remove_contained_docs",
    "ev_session_stats", "ev_markov_transition",
    // round-17 addition: DSIR importance weighting
    "pipe_dsir_weights",
    // round-18 additions: TPC-H completion (q2/q9/q11/q12/q16/q20) +
    // URL-first curation stage
    "tpch_q2_min_cost", "tpch_q9_profit", "tpch_q11_important_parts",
    "tpch_q12_late_lines", "tpch_q16_supplier_cnt", "tpch_q20_promo_suppliers",
    "pipe_url_dedup", "mm_flac_decode", "text_entropy", "vec_ann_ivf_filtered",
    "pipe_badwords_filter",
    // round-19 additions: windowed entropy (the w64 row BINDS on every
    // fixture doc; w4096 drives the conf-sized LUT)
    "text_entropy_w64", "text_entropy_w4096",
    // round-20 additions: the adaptive filtered-ANN production entry
    // point, both dispatch branches (widened-probe IVF / exact
    // filtered brute-force fallback)
    "vec_ann_adaptive", "vec_ann_adaptive_sparse",
    // osm fixture end-to-end + 2M-node scale probes (osm_split_topology
    // = same workload over a two-shard border-overlapping split: the
    // multi-file border-dedup shuffle's round-over-round signal)
    "osm_buildings", "osm_topology",
    "osm_big_pois", "osm_big_topology", "osm_big_buildings",
    "osm_split_topology")

  /** Extract the per-query wall dict from a JSON-ish string: the first
    * `"queries":{...}` block. Returns empty when the marker is absent —
    * deliberately NO free-regex harvest of bare "name":number pairs:
    * BENCH_r07's tail was truncated just past the wall dict, so the
    * surviving first-occurrence pairs were the CPU dict, and a regex
    * fallback would have reported CPU-seconds as "previous wall",
    * manufacturing phantom 2-10x regressions. Missing prev is honest;
    * wrong-unit prev is poison. */
  private[graft] def wallBlock(txt: String): Seq[(String, Double)] =
    dictBlock(txt, "queries")

  /** Extract the first `"<key>":{...}` flat string→number dict. */
  private[graft] def dictBlock(txt: String, key: String): Seq[(String, Double)] = {
    val tag = "\"" + key + "\":{"
    val ix = txt.indexOf(tag)
    if (ix < 0) Nil
    else {
      val start = ix + tag.length
      val end0 = txt.indexOf('}', start)
      val end = if (end0 < 0) txt.length else end0
      txt.substring(start, end).split(",").toSeq.flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => scala.util.Try(
            k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble).toOption
          case _ => None
        }
      }
    }
  }

  /** The record's own `"load_max"` stamp; Double.MaxValue when absent
    * (an unstamped record never wins a quiet-preference comparison). */
  private[graft] def loadMaxOf(txt: String): Double =
    "\"load_max\"\\s*:\\s*(-?[0-9.]+)".r.findFirstMatchIn(txt)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
      .getOrElse(Double.MaxValue)

  /** Previous-round record: per-query wall + CPU seconds and the source
    * file name, for the artifact's `prev` block and the taint check.
    * Source preference:
    *  1. the QUIETEST committed record of the newest round: among
    *     `bench/{bench,judge_probe}_r{N}[_suffix].json` files sharing
    *     the highest round number, the one with the lowest recorded
    *     `load_max` wins (VERDICT r10 task 5 — round-over-round deltas
    *     must compare quiet-to-quiet, not quiet-to-contended; r9 and
    *     r10 both lost judge attention to phantom regressions measured
    *     at load 5-8);
    *  2. else the newest harness `BENCH_r*.json`, but ONLY via the
    *     explicit `"queries":{` marker (see [[wallBlock]] for why the
    *     old free-regex fallback is gone).
    * Empty on round 1 / outside the repo checkout. "Newest" sorts by
    * the extracted round NUMBER, not the file name: lexicographically
    * "bench_r9.json" > "bench_r10.json", so a name sort would have
    * frozen `prev` at round 9 forever once double-digit rounds exist. */
  final case class PrevRecord(wall: Map[String, Double],
      cpu: Map[String, Double], source: String)

  private[graft] def prevRecord(
      benchDir: String = "/root/repo/bench",
      repoDir: String = "/root/repo",
      currentRound: Int = Int.MaxValue): PrevRecord = {
    def read(f: java.io.File): String =
      scala.util.Using(scala.io.Source.fromFile(f))(_.mkString).getOrElse("")
    val pat = "^(?:bench|judge_probe)_r(\\d+)(?:_[A-Za-z0-9]+)?\\.json$".r
    // records of the CURRENT round are excluded: "prev" means the
    // previous ROUND's state, and a same-round earlier run (e.g. an
    // aborted/polluted attempt this main later overwrites) would make
    // the committed record cite a file state that no longer exists
    val candidates = Option(new java.io.File(benchDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => pat.findFirstMatchIn(f.getName).map(m => (m.group(1).toInt, f)))
      .filter(_._1 < currentRound)
    val newestRound = candidates.map(_._1).maxOption
    val committed = newestRound.toSeq.flatMap { rn =>
      candidates.filter(_._1 == rn).map { case (_, f) =>
        val txt = read(f)
        (loadMaxOf(txt), f.getName, wallBlock(txt), dictBlock(txt, "cpu"))
      }.filter(_._3.nonEmpty).sortBy(_._1).headOption
    }
    committed.headOption match {
      case Some((_, name, wall, cpu)) =>
        PrevRecord(wall.toMap, cpu.toMap, name)
      case None =>
        val harness = Option(new java.io.File(repoDir).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .flatMap(f => "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName)
            .map(m => (m.group(1).toInt, f)))
          .sortBy(_._1).lastOption
        harness.map(h => PrevRecord(
          wallBlock(read(h._2).replace("\\\"", "\"")).toMap, Map.empty, h._2.getName))
          .getOrElse(PrevRecord(Map.empty, Map.empty, ""))
    }
  }

  private[graft] def prevRound(
      benchDir: String = "/root/repo/bench",
      repoDir: String = "/root/repo"): Map[String, Double] =
    prevRecord(benchDir, repoDir).wall

  /** One timed repetition: wall/CPU seconds, the 1-min system load
    * sampled immediately before it started, the row count, and whether
    * the query thunk threw. A failed rep keeps its wall time (the cost
    * of reaching the error) but is excluded from every min below.
    *
    * JVM-health telemetry per rep (VERDICT r16 task 1 — BENCH_r16's
    * 10-30x CPU inflation on the driver host could not be adjudicated
    * from the artifact because only wall/cpu/load were recorded):
    *  - `gc` — GC seconds charged DURING this rep (GarbageCollectorMXBean
    *    collection-time delta): high gc with high cpu = in-JVM heap
    *    pressure; low gc with high cpu = work outside the collector
    *    (kernel reclaim, interpreter execution, real plan change);
    *  - `jit` — JIT compiler-thread seconds during this rep
    *    (CompilationMXBean delta): a large value on late reps means
    *    compilation churn (code-cache flushing / deopt storms), the
    *    signature that distinguishes "codegen classes thrash the code
    *    cache" from "heap pressure";
    *  - `heap` — used heap MB sampled right after the rep.
    * All three default to -1 sentinels when the platform bean is
    * absent, exactly like the cpu sentinel. */
  final case class Rep(wall: Double, cpu: Double, load: Double,
      rows: Long, failed: Boolean, gc: Double = -1.0, jit: Double = -1.0,
      heap: Double = -1.0)

  final case class QRes(name: String, wall: Double, cpu: Double,
      load: Double, rows: Long, reps: Seq[Rep])

  /** Run `thunk` `nReps` times and fold to min-of-successful-reps.
    * Failure accounting is by construction contradiction-free (VERDICT
    * r9 task 4): the -1.0 wall/cpu sentinel appears IFF every rep
    * failed, and each rep carries its own `failed` bit, so the `reps`
    * array in the artifact can never disagree with the headline number
    * the way BENCH_r08's did. */
  private[graft] def measure(name: String, nReps: Int,
      loadFn: () => Double, cpuNanosFn: () => Long,
      thunk: () => Long, pace: () => Unit = () => (),
      gcMillisFn: () => Long = () => -1L,
      jitMillisFn: () => Long = () => -1L,
      heapMbFn: () => Double = () => -1.0): QRes = {
    val reps = (1 to nReps).map { _ =>
      // pace before EVERY rep, not just the row (r13: a GC burst
      // between a row-level pace check and rep 1 stamped a 3.9 load
      // on an otherwise quiet run; reps 2-3 also deserve a decayed
      // start after rep 1's own 32-thread burst)
      pace()
      val load = loadFn()
      val c0 = cpuNanosFn()
      val g0 = gcMillisFn()
      val j0 = jitMillisFn()
      val t0 = System.nanoTime()
      val (rows, failed) =
        try (thunk(), false) catch { case _: Throwable => (-1L, true) }
      val c1 = cpuNanosFn()
      val cpuS = if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9
      def deltaS(a: Long, b: Long): Double =
        if (a < 0 || b < 0) -1.0 else (b - a) / 1e3
      Rep((System.nanoTime() - t0) / 1e9, cpuS, load, rows, failed,
        gc = deltaS(g0, gcMillisFn()), jit = deltaS(j0, jitMillisFn()),
        heap = heapMbFn())
    }
    val ok = reps.filterNot(_.failed)
    QRes(name,
      if (ok.nonEmpty) ok.map(_.wall).min else -1.0,
      if (ok.nonEmpty) ok.map(_.cpu).min else -1.0,
      if (reps.nonEmpty) reps.head.load else -1.0,
      if (ok.nonEmpty) ok.head.rows else -1L,
      reps)
  }

  /** First-rep blowup flag (VERDICT r16 task 6): min-of-N hid a 71 s
    * first rep in BENCH_r16 — the record now carries first-rep wall/cpu
    * as first-class dicts and flags any row whose SUCCESSFUL first rep
    * exceeds [[FirstRepFactor]]x the row's min wall. A failed first rep
    * is already loud (the "FAIL" marker), so it is not double-flagged
    * here. The flag is a regression detector, not a taint: warmup this
    * large means the row pays a real cold-start cost that a min-of-N
    * headline erases. */
  private[graft] val FirstRepFactor = 5.0
  private[graft] def firstRepBlown(r: QRes): Boolean = {
    val ok = r.reps.filterNot(_.failed)
    ok.nonEmpty && r.reps.headOption.exists(h =>
      !h.failed && h.wall > FirstRepFactor * ok.map(_.wall).min)
  }

  /** First-rep-inclusive total (VERDICT r21 task 6): the min-of-reps
    * headline erases one-time memo/index build cost from every row;
    * this second total sums each row's FIRST successful rep (headline
    * -1 sentinel for all-FAIL rows), so amortized cold-start/build
    * cost is a visible headline number next to the min-of-reps total
    * — not only a `first_flagged` name list. Requeue adjustment is
    * deliberately NOT applied: the number describes the in-run cold
    * sequential pass. */
  private[graft] def firstRepTotal(res: Seq[QRes]): Double =
    res.map(r => r.reps.find(!_.failed).map(_.wall).getOrElse(-1.0)).sum

  /** Host-contention taint thresholds (VERDICT r10 task 1). A row is
    * TAINTED when the rep its headline min came from started at 1-min
    * load above [[TaintLoadThreshold]] (this JVM is the only intended
    * tenant; ambient load ≈ other tenants' threads stealing the same
    * cores), or burned more than [[TaintCpuRatio]]× the previous
    * round's committed CPU for the same row AND either (a) the
    * headline rep's CPU is an OUTLIER against the row's own best CPU
    * reading (more than [[TaintCpuSpread]]× the lowest successful
    * rep's CPU — a spike confined to the min-wall rep is exactly the
    * one-rep pollution that must stay guarded; a single-rep row
    * cannot demonstrate stability and stays guarded too), or (b)
    * EVERY successful rep started at 1-min load above
    * [[SustainedLoadThreshold]] — reproducible co-tenancy below the
    * hard 4.0 threshold inflates CPU consistently on every rep and
    * would otherwise evade both rules (ADVICE r12). The
    * outlier/sustained co-condition is a round-12/13 refinement: a
    * reproducible CPU jump AT QUIET LOAD is a PLAN CHANGE — r12's
    * ev_anomaly/tpch_q22 moved from single-task windows to the
    * multi-stage DistributedRank form, reproduced the same higher CPU
    * on every rep at ambient load 0.3, and were stamped "tainted"
    * anyway (a false contention signal; a mid-run load floor cannot
    * fix it because the bench's OWN decaying bursts keep 1-min load
    * at 2-4 for most rows). Genuine pollution is either stochastic
    * (BENCH_r10's phantom 6-11× rows swung between reps) or
    * load-visible on every rep. */
  private[graft] val TaintLoadThreshold = 4.0
  private[graft] val TaintCpuRatio = 3.0
  private[graft] val TaintCpuSpread = 1.3
  private[graft] val SustainedLoadThreshold = 2.0

  /** Inter-query pacing target (VERDICT r12 #6): each row starts only
    * once the 1-min load has decayed below this, so the bench's OWN
    * 32-thread bursts from earlier rows neither steal cores from the
    * single-shot osm_big_* probes nor push `load_max` into the 2-4
    * band where it stops being an ambient-quiet signal. Bounded by
    * the SPARK_GRAFT_BENCH_PACE_S budget (default 1200 s shared across
    * the run; 0 disables pacing). Applied before every REP. */
  private[graft] val PaceLoadThreshold = 2.0

  /** Is this row's headline measurement contention-tainted? Judged on
    * the MIN-WALL successful rep (the one the headline number comes
    * from); a row with no successful rep is a FAIL, not a taint. */
  private[graft] def taintedRes(r: QRes, prevCpu: Option[Double]): Boolean = {
    val ok = r.reps.filterNot(_.failed)
    ok.nonEmpty && {
      val m = ok.minBy(_.wall)
      val cpus = ok.map(_.cpu).filter(_ > 0).sorted
      // headline-vs-best comparison: the min-wall rep's CPU is an
      // outlier against the row's best CPU reading (one-rep pollution
      // confined to the rep the headline comes from); a single
      // successful rep cannot demonstrate stability and stays guarded
      val cpuOutlier = cpus.length < 2 || m.cpu > TaintCpuSpread * cpus.head
      // sustained sub-threshold co-tenancy: every rep ran at elevated
      // (>2.0) load, so a consistent CPU blow is contention that
      // reproduces, not a plan change measured on a quiet host
      val sustainedLoad = ok.forall(_.load > SustainedLoadThreshold)
      m.load > TaintLoadThreshold ||
        ((cpuOutlier || sustainedLoad) &&
          prevCpu.exists(pc => pc > 0 && m.cpu > 0 && m.cpu > TaintCpuRatio * pc))
    }
  }

  /** Wait for the 1-min load to drop back under the taint threshold
    * before a re-run — a tainted first attempt usually means a
    * transient co-tenant burst (compiles, another bench). Returns true
    * when the host actually quieted (re-run is worth it); false under
    * SUSTAINED contention, where a re-run would just re-measure the
    * same noise and the row should stay stamped tainted. The wait is
    * bounded per call AND by the caller's shared budget: without the
    * budget, a fully-contended 49-row run would spend 49 × 90 s
    * sleeping. */
  private def taintBackoff(loadFn: () => Double, budgetS: () => Long,
      spendS: Long => Unit, maxWaitS: Int = 90): Boolean = {
    val t0 = System.nanoTime()
    def elapsedS = (System.nanoTime() - t0) / 1e9
    var l = loadFn()
    while (l > TaintLoadThreshold && elapsedS < math.min(maxWaitS, budgetS())) {
      Thread.sleep(5000)
      l = loadFn()
    }
    spendS(math.round(elapsedS))
    l <= TaintLoadThreshold
  }

  /** Per-rep artifact entries: `[wall,cpu,load,gc,jit,heapMB]` for a
    * successful rep, the literal string `"FAIL"` for a failed one.
    * gc/jit are the rep's GC and JIT-compiler seconds, heapMB the used
    * heap right after it (-1 sentinels when unavailable) — see [[Rep]]. */
  private[graft] def repsJson(reps: Seq[Rep]): String =
    reps.map { r =>
      if (r.failed) "\"FAIL\""
      else f"[${r.wall}%.3f,${r.cpu}%.2f,${r.load}%.2f,${r.gc}%.2f,${r.jit}%.2f,${r.heap}%.0f]"
    }.mkString("[", ",", "]")

  /** JIT-churn flag (VERDICT r17 task 1a): the row's HEADLINE (min-
    * wall) rep burned more than [[ChurnCpuRatio]]× the previous
    * round's committed CPU AND more than [[ChurnJitShare]] of that
    * rep's CPU was the JIT compiler — BENCH_r17's q22 signature
    * (rep 1: 148 CPU-s of which 102 s JIT; a fresh JVM reads 4.8).
    * High CPU with LOW jit share is real work (a plan change) and is
    * deliberately not flagged here — the taint rules own that case. */
  private[graft] val ChurnCpuRatio = 2.0
  private[graft] val ChurnJitShare = 0.25
  private[graft] def churned(r: QRes, prevCpu: Option[Double]): Boolean = {
    val ok = r.reps.filterNot(_.failed)
    ok.nonEmpty && {
      val m = ok.minBy(_.wall)
      m.cpu > 0 && m.jit > ChurnJitShare * m.cpu &&
        prevCpu.exists(pc => pc > 0 && m.cpu > ChurnCpuRatio * pc)
    }
  }

  /** Monotone rep-growth flag (VERDICT r17 task 1c): wall or CPU
    * STRICTLY rising across all successful reps with a meaningful
    * slope (last > [[GrowthFactor]] × first) — the shape min-of-3
    * hides (BENCH_r17's pipe_full_curation read 15→45→58 CPU-s while
    * its headline min looked fine). Three successful reps minimum: two
    * points cannot distinguish growth from the first-rep warmup that
    * [[firstRepBlown]] already names. */
  private[graft] val GrowthFactor = 1.3
  private[graft] def repGrowth(r: QRes): Boolean = {
    val ok = r.reps.filterNot(_.failed)
    def growing(xs: Seq[Double]): Boolean =
      xs.length >= 3 && xs.head > 0 &&
        xs.zip(xs.tail).forall { case (a, b) => b > a } &&
        xs.last > GrowthFactor * xs.head
    growing(ok.map(_.wall)) || growing(ok.map(_.cpu))
  }

  /** Fresh-JVM requeue bounds: at most [[MaxRequeue]] rows re-measured
    * in ONE forked child (graft.BenchOne — same classpath and JVM
    * options as this process), with a hard wall-clock ceiling so a
    * hung child cannot stall the round-close record. */
  private[graft] val MaxRequeue = 8
  private[graft] val RequeueBaseTimeoutS = 240L
  private[graft] val RequeuePerQueryTimeoutS = 120L

  /** Severity-ranked requeue selection (VERDICT r19 task 1). The old
    * `.take(MaxRequeue)` cut candidates in RUN order, so when flags
    * exceeded the cap the tail of the over2x list — late-run rows,
    * exactly the ones measured while a host degrades — fell off: the
    * r19 driver record shipped its three WORST outliers (16.4×/13.4×/
    * 12.8× over prev) un-requeued while a 2.0× row got a slot, and the
    * artifact never named what was cut. Candidates now sort by their
    * severity RATIO descending (over2x rows by wall-vs-prev, churn
    * rows by cpu-vs-prev, growth rows by last-vs-first rep — a name
    * flagged by several sources takes its max), name ties broken
    * alphabetically so the selection is deterministic, and BOTH halves
    * are returned: `(selected, dropped)` — the dropped names go into
    * the committed record's `requeue_dropped` field, so a capped
    * adjudication is readable from the artifact alone (an
    * `adjudicated: true` with non-empty `requeue_dropped` is partial). */
  private[graft] def rankRequeue(candidates: Seq[(String, Double)],
      max: Int = MaxRequeue): (Seq[String], Seq[String]) = {
    val ordered = candidates.groupBy(_._1).toSeq
      .map { case (n, xs) => (n, xs.map(_._2).max) }
      .sortBy { case (n, sev) => (-sev, n) }
      .map(_._1)
    (ordered.take(max), ordered.drop(max))
  }

  /** Every requeue candidate with its severity ratio — the input of
    * [[rankRequeue]], extracted from the run loop so the severity
    * SOURCES are unit-pinnable alongside the flags they derive from
    * (BenchFlagsSpec): a churn-flagged row ranks by its min-wall rep's
    * CPU inflation vs the previous round, a growth-flagged row by the
    * steeper of its wall/cpu last-vs-first rep slopes, an over-2x row
    * by its headline wall ratio vs the previous round; a name flagged
    * by several sources appears once per source and [[rankRequeue]]
    * takes its max. */
  private[graft] def requeueCandidates(res: Seq[QRes],
      prevWall: Map[String, Double],
      prevCpu: Map[String, Double]): Seq[(String, Double)] = {
    val churnSev = res.flatMap { r =>
      if (!churned(r, prevCpu.get(r.name))) None
      else {
        val m = r.reps.filterNot(_.failed).minBy(_.wall)
        prevCpu.get(r.name).filter(_ > 0).map(pc => r.name -> m.cpu / pc)
      }
    }
    val growthSev = res.flatMap { r =>
      if (!repGrowth(r)) None
      else {
        val ok = r.reps.filterNot(_.failed)
        def slope(xs: Seq[Double]): Double =
          if (xs.length >= 2 && xs.head > 0) xs.last / xs.head else 1.0
        Some(r.name -> math.max(slope(ok.map(_.wall)), slope(ok.map(_.cpu))))
      }
    }
    val over2xSev = res.flatMap { r =>
      prevWall.get(r.name) match {
        case Some(pw) if pw > 0 && r.wall >= 0 && r.wall > 2.0 * pw =>
          Some(r.name -> r.wall / pw)
        case _ => None
      }
    }
    // no-prev blind spot (VERDICT r20 task 2 / r21 task 9): a row
    // ABSENT from a non-empty prev record is new in the registry, so
    // none of the ratio flags can ever fire on it and its debut
    // measurement would ship un-adjudicated. It enters the candidate
    // pool at the LOWEST severity — it fills spare requeue slots but
    // never displaces a real ≥2× flag under the cap. An entirely
    // empty prev (round 1 / outside the checkout) flags nothing:
    // every row would be "new" and the cap would pick 8 arbitrarily.
    val newRowSev =
      if (prevWall.isEmpty) Nil
      else res.collect {
        case r if r.wall >= 0 && !prevWall.contains(r.name) => r.name -> 1.0
      }
    churnSev ++ growthSev ++ over2xSev ++ newRowSev
  }

  /** Requeue outcome: fresh-JVM headline values + the raw per-query
    * detail lines, plus a loud failure marker for the committed
    * artifact. `failReason` is Some whenever the adjudication is
    * incomplete — fork failure, child timeout/kill, non-zero exit, or
    * zero well-formed output lines for a non-empty request — so an
    * empty `requeued` block can never again read as "nothing was
    * flagged" when the truth is "the child died" (ADVICE r18). Partial
    * output is kept alongside the reason: lines the child flushed
    * before dying are real measurements. */
  final case class RequeueOutcome(
      vals: Map[String, (Double, Double, Long)],
      detail: Map[String, String],
      failReason: Option[String])
  object RequeueOutcome {
    val empty: RequeueOutcome = RequeueOutcome(Map.empty, Map.empty, None)
  }

  /** Child-JVM resource bounds (VERDICT r18 task 1b): BENCH_r18's
    * driver run died with SIGKILL inside the requeue because the child
    * replayed the parent's full `-Xms8g -Xmx8g -XX:+AlwaysPreTouch`
    * args — a second fully-pre-touched 8 GiB Spark next to the parent
    * that still held ~131 queries of state. The child now gets a
    * bounded heap (default 4g, SPARK_GRAFT_REQUEUE_HEAP) and a pinned
    * local[8] session (SPARK_GRAFT_REQUEUE_CPUS → SPARK_GRAFT_CPUS in
    * the child env); min-of(in-run, fresh) adoption keeps the smaller
    * child conservative — it can only make rows FASTER in the record. */
  private[graft] def requeueChildHeap: String =
    sys.env.getOrElse("SPARK_GRAFT_REQUEUE_HEAP", "4g")
  private[graft] def requeueChildCpus: String =
    sys.env.getOrElse("SPARK_GRAFT_REQUEUE_CPUS", "8")

  /** Parent JVM args → child JVM args: drop heap pins (replaced by the
    * bounded `-Xmx`), the pre-touch flag (pointless at 4g, and the
    * very thing that made the r18 child's startup an 8 GiB RSS burst),
    * and any agent/port-binding arg — a JMX port, jdwp address or
    * flight-recorder output file is a FIXED resource the parent
    * already holds, so replaying it makes the child fail to start
    * (ADVICE r18). */
  private[graft] def childJvmArgs(parentArgs: Seq[String],
      maxHeap: String): Seq[String] = {
    val drop = Seq("-Xmx", "-Xms", "-XX:+AlwaysPreTouch",
      "-agentlib", "-agentpath", "-javaagent",
      "-Dcom.sun.management.jmxremote",
      "-XX:StartFlightRecording", "-XX:FlightRecorderOptions")
    parentArgs.filterNot(a => drop.exists(a.startsWith)) :+ s"-Xmx$maxHeap"
  }

  /** Fork `graft.BenchOne <names...>` in a FRESH JVM (same java binary
    * and classpath as this process; JVM args filtered and re-bounded
    * by [[childJvmArgs]]) and parse its per-query JSON lines. ANY
    * failure degrades to a non-empty `failReason` in the outcome (the
    * in-run record stands; the requeue is adjudication, not a gate),
    * logged to stderr AND surfaced in the committed artifact. */
  private[graft] def freshJvmMeasure(names: Seq[String],
      extraEnv: Map[String, String] = Map.empty,
      mainClass: String = "graft.BenchOne"): RequeueOutcome = try {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    import scala.jdk.CollectionConverters._
    val jvmArgs = childJvmArgs(
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq, requeueChildHeap)
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), mainClass) ++ names
    val pb = new ProcessBuilder(cmd.asJava)
    // env overrides on top of inheritance: the child session is pinned
    // to local[requeueChildCpus] FIRST, then the caller's overrides
    // win (the fork spec pins the child to the cheap fixture; the
    // bench itself passes nothing — the child must read the SAME
    // SPARK_GRAFT_SF_DIR as the run)
    pb.environment().put("SPARK_GRAFT_CPUS", requeueChildCpus)
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    val out = new java.lang.StringBuilder
    def drain(is: java.io.InputStream, f: String => Unit): Thread = {
      val t = new Thread(() => {
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(is))
        var l = br.readLine()
        while (l != null) { f(l); l = br.readLine() }
      })
      t.setDaemon(true); t.start(); t
    }
    val outT = drain(p.getInputStream,
      l => out.synchronized { out.append(l).append('\n') })
    val errT = drain(p.getErrorStream, l => System.err.println(s"[benchone] $l"))
    val deadline = RequeueBaseTimeoutS + RequeuePerQueryTimeoutS * names.size
    var timedOut = false
    if (!p.waitFor(deadline, java.util.concurrent.TimeUnit.SECONDS)) {
      System.err.println(s"[bench] requeue child timed out after ${deadline}s — killing")
      timedOut = true
      p.destroyForcibly()
      p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    }
    outT.join(5000); errT.join(5000)
    val exit = try p.exitValue() catch { case _: Throwable => Int.MinValue }
    val pat = ("\\{\"benchone\":\"([^\"]+)\",\"wall\":(-?[0-9.]+)," +
      "\"cpu\":(-?[0-9.]+),\"rows\":(-?\\d+)").r
    // a line truncated by the timeout kill could still match the
    // prefix pattern; embedding the fragment verbatim would corrupt
    // the committed round JSON (the durable `prev` source). Accept a
    // detail line only when its braces/brackets balance and it closes.
    def wellFormed(l: String): Boolean =
      l.endsWith("}") &&
        l.count(_ == '{') == l.count(_ == '}') &&
        l.count(_ == '[') == l.count(_ == ']')
    val lines = out.synchronized(out.toString).split('\n').map(_.trim)
      .filter(l => l.contains("\"benchone\"") && wellFormed(l)).toSeq
    val vals = lines.flatMap(l => pat.findFirstMatchIn(l).map(m =>
      m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble,
        m.group(4).toLong))).toMap
    val detail = lines.flatMap(l =>
      pat.findFirstMatchIn(l).map(m => m.group(1) -> l)).toMap
    val failReason =
      if (timedOut) Some(s"child timed out after ${deadline}s and was killed")
      else if (exit != 0) Some(s"child exited $exit")
      else if (names.nonEmpty && vals.isEmpty)
        Some("child exited 0 but produced no well-formed output lines")
      else {
        // a clean exit with SOME requested rows missing — or present
        // only as all-FAIL sentinels (wall < 0: every child rep threw,
        // e.g. an OOM at the child's 4g bound) — is still incomplete
        // adjudication (review r19 ×2: count comparison would let an
        // equal number of wrongly-named rows mask a dropped name, and
        // a -1 sentinel row has no adjudicating measurement in it)
        val missing = names.distinct.filterNot(n =>
          vals.get(n).exists(_._1 >= 0))
        if (missing.isEmpty) None
        else Some(s"child exited 0 but adjudicated only " +
          s"${names.distinct.size - missing.size}/${names.distinct.size} " +
          s"rows (missing or all-FAIL: ${missing.mkString(", ")})")
      }
    // the adjudicated count mirrors the failReason semantics: requested
    // names with a VALID wall — raw vals.size would count all-FAIL
    // sentinels and stray wrong-named rows (review r19 pass 4)
    val adjudicatedN = names.distinct.count(n => vals.get(n).exists(_._1 >= 0))
    failReason.foreach(r => System.err.println(s"[bench] requeue FAILED: $r " +
      s"($adjudicatedN/${names.distinct.size} rows still adjudicated)"))
    RequeueOutcome(vals, detail, failReason)
  } catch { case t: Throwable =>
    System.err.println(s"[bench] requeue fork failed: $t")
    RequeueOutcome(Map.empty, Map.empty, Some(s"fork failed: ${t.getClass.getName}: ${t.getMessage}"))
  }

  /** The MICRO record line — the LAST stdout line of each emission
    * phase, size-bounded so the harness's 2000-char stdout tail always
    * ends on one complete parseable JSON object. Round-19 finding: the
    * slim line (total + the per-query wall dict) outgrew 2000 chars
    * once the registry passed ~75 queries, so the driver's BENCH_r*
    * `parsed` field has been null since r15 even on clean rc=0 runs —
    * the full per-query record lives in the committed
    * bench/bench_r{N}.json (and the full/slim stdout lines above), so
    * the micro line carries only the headline scalars + flag COUNTS +
    * the pointer to the full record. Bounded under 1000 chars at ANY
    * input (no unbounded lists; every string field truncated then
    * escaped — BenchMicroSpec pins the bound and parseability at a
    * hostile 10k-query / quote-newline-backslash-reason shape), and
    * numbers are formatted locale-independently: this is the one line
    * whose entire contract is "always parses", so it cannot inherit
    * the ambient default locale the way the human-facing lines do
    * (review r19 pass 5 ×3). */
  private[graft] def microLine(total: Double, nQueries: Int, round: Int,
      adjudicated: Boolean, requeueFailed: Option[String], loadMax: Double,
      nTainted: Int, nFirstFlagged: Int, nRequeued: Int,
      nRequeueDropped: Int, sf: String, fullRecord: String,
      totalFirst: Double = -1.0): String = {
    // cap AFTER escaping, so the bound holds on the bytes that land in
    // the line (ADVICE r19: a pre-escape cap let backslash-heavy
    // inputs double past the documented bound post-escape). The escaped
    // alphabet is simple — quotes become ', control chars become
    // space, so the ONLY escape sequence present is \\ — and a cut
    // that splits one \\ pair leaves exactly one dangling backslash at
    // the cut edge (trailing for a left-cut, leading for a right-cut),
    // repaired by dropping one to keep every backslash run even.
    def jstr(raw: String, cap: Int, fromRight: Boolean = false): String = {
      val esc = raw.replace("\\", "\\\\").replace("\"", "'")
        .replaceAll("\\p{Cntrl}", " ")
      val cut0 = if (fromRight) esc.takeRight(cap) else esc.take(cap)
      val cut =
        if (fromRight) {
          if (cut0.takeWhile(_ == '\\').length % 2 == 1) cut0.drop(1) else cut0
        } else {
          if (cut0.reverse.takeWhile(_ == '\\').length % 2 == 1) cut0.dropRight(1)
          else cut0
        }
      "\"" + cut + "\""
    }
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f",
        java.lang.Double.valueOf(v))
    val fail = requeueFailed.map(jstr(_, 200)).getOrElse("null")
    s"""{"metric":"total","value":${num(total, 3)},"value_first":${num(totalFirst, 3)},"unit":"sec","round":$round,"n_queries":$nQueries,"adjudicated":$adjudicated,"requeue_failed":$fail,"load_max":${num(loadMax, 2)},"n_tainted":$nTainted,"n_first_flagged":$nFirstFlagged,"n_requeued":$nRequeued,"n_requeue_dropped":$nRequeueDropped,"full_record":${jstr(fullRecord, 160, fromRight = true)},"sf":${jstr(sf, 120)}}"""
  }

  /** Two-phase record emission (VERDICT r18 task 1a). BENCH_r18's
    * driver artifact was `parsed: null` with exit 137: all ~131
    * measurements existed, but the runner was SIGKILLed inside the
    * end-of-run requeue and the full JSON was only emitted AFTER it.
    * Phase 1 emits + durably commits the complete UNADJUDICATED
    * record BEFORE any child JVM is forked; phase 2 emits the
    * adjudicated record that supersedes it. A kill anywhere inside
    * the fork now degrades to an unadjudicated record, never to
    * nothing. Extracted so the ordering is spec-pinnable
    * (BenchForkSpec SIGKILLs a fake child through this path). */
  private[graft] def twoPhaseEmit(
      requeueNames: Seq[String],
      emitPhase1: () => Unit,
      fork: Seq[String] => RequeueOutcome,
      emitPhase2: RequeueOutcome => Unit): RequeueOutcome = {
    emitPhase1()
    val out =
      if (requeueNames.isEmpty) RequeueOutcome.empty
      else fork(requeueNames)
    emitPhase2(out)
    out
  }

  /** Non-colliding default record path (VERDICT r19 task 5): when
    * `bench_r{N}.json` already exists at process start — the builder
    * committed the round's quiet record and the driver runs later in
    * the same round — return the first free round-suffixed sibling
    * (`bench_r{N}_2.json`, `_3`, ...) instead of the base name: the
    * r19 driver run silently overwrote the committed 67.9 s record
    * with its 88.6 s contended one, leaving the file contradicting the
    * README narrative that cited it. The suffix matches [[prevRecord]]'s
    * committed-record pattern, so next round's quietest-of-round `prev`
    * selection sees both files. Callers resolve ONCE per run (phase 1
    * creates the file; a per-emission probe would push phase 2's
    * superseding record to yet another path). */
  private[graft] def resolveBenchOut(dir: java.io.File, round: Int): java.io.File = {
    val base = new java.io.File(dir, s"bench_r$round.json")
    if (!base.exists()) base
    else Iterator.from(2)
      .map(i => new java.io.File(dir, s"bench_r${round}_$i.json"))
      .find(!_.exists()).get
  }

  /** Current round number, derived from the newest harness BENCH file
    * (BENCH_r07.json present => this run is round 8). Falls back to 0
    * outside the repo checkout. Shared with ScaleProbe so the committed
    * scale artifact carries the same round stamp as the bench record. */
  private[graft] def roundNumber: Int = {
    Option(new java.io.File("/root/repo").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .sorted.lastOption.map(_ + 1).getOrElse(0)
  }

  def main(args: Array[String]): Unit = {
    // the artifact line must be valid JSON on any host JVM: a default
    // locale with ',' as decimal separator would make every f"" number
    // unparseable (ADVICE r7)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchRig.buildSession()
    // untimed warmup: touch every table once so the timed loop measures
    // steady-state query latency, not JVM/codegen/file-index warmup
    BenchRig.warmup(spark, sfDir)
    val qs = SparkEntry.queries
    // process CPU-seconds alongside wall per rep: on a contended host
    // the wall clock swings 10-20x with steal while CPU-seconds of
    // actual work stay comparable (TimeQuery doctrine) — BENCH_r06
    // recorded a phantom 2.1x "regression" that was pure host noise and
    // could not be diagnosed from the artifact because only wall was
    // recorded. The system 1-min load average sampled before each query
    // is the second sentinel: a polluted run shows load >> this JVM's
    // own parallelism, making noise self-evident from the JSON alone.
    // JVM-health beans (VERDICT r16 task 1) live in BenchRig — shared
    // with the BenchOne requeue child so both timing protocols sample
    // the same sources: GC time, JIT-compiler time, heap; plus the
    // code-cache / metaspace pools here, so a repeat of the r16
    // driver-host CPU inflation self-adjudicates from the artifact
    // (heap pressure vs compilation churn vs external work)
    import scala.jdk.CollectionConverters._
    def procCpuNanos(): Long = BenchRig.procCpuNanos()
    def loadAvg(): Double = BenchRig.loadAvg()
    def gcMillis(): Long = BenchRig.gcMillis()
    def jitMillis(): Long = BenchRig.jitMillis()
    def heapUsedMb(): Double = BenchRig.heapUsedMb()
    val memBean = BenchRig.memBean
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolMb(subs: Seq[String])(of: java.lang.management.MemoryUsage => Long): Double = {
      val vs = pools.filter(p =>
          subs.exists(p.getName.toLowerCase.contains))
        .map(p => of(p.getUsage)).filter(_ >= 0)
      if (vs.isEmpty) -1.0 else vs.sum / 1048576.0
    }
    // "codeheap" = segmented code cache (default); "code cache" = the
    // unsegmented pool under -XX:-SegmentedCodeCache — the very JVM
    // configuration someone chasing a JIT-churn hypothesis would run,
    // where a -1 sentinel would blind the adjudication (review r17)
    val codePools = Seq("codeheap", "code cache")
    def jvmJson(): String = {
      val hu = memBean.getHeapMemoryUsage
      f"""{"heap_used_mb":${hu.getUsed / 1048576.0}%.0f,"heap_max_mb":${hu.getMax / 1048576.0}%.0f,""" +
        f""""code_used_mb":${poolMb(codePools)(_.getUsed)}%.1f,"code_max_mb":${poolMb(codePools)(_.getMax)}%.1f,""" +
        f""""meta_used_mb":${poolMb(Seq("metaspace"))(_.getUsed)}%.1f,""" +
        f""""gc_total_s":${gcMillis() / 1e3}%.2f,"jit_total_s":${jitMillis() / 1e3}%.2f}"""
    }
    val jvmStart = jvmJson()
    // per-query persisted-block snapshot taken right before the row
    // runs: [persisted RDD count, persisted MB, pinned RDD count] —
    // names whether block accumulation tracks a degradation
    def storageSnap(): (Int, Double, Int) = BenchRig.storageSnap(spark)
    // three timed reps for EVERY row, report the min: single-shot
    // numbers swing ±2x from GC/codegen/scheduler jitter, and the
    // heavy per-way-walk probes JIT across the first TWO executions
    // (r7's "96 CPU-s" osm_big_buildings was min-of-2 catching the
    // warmup rep of a ~20 CPU-s steady state; isolated reps ran
    // 90 → 24 → 21 → 20). Round 8 gave osm_big_* a third rep; round 9
    // proved 2 reps is still warmup-blind elsewhere (g10_topo_segments
    // min-of-2 read 6.68s vs 1.54s quiet-host steady state — first-rep
    // CPU was 6x steady state), so the 3-rep treatment is now uniform.
    // Per-rep load lands in the reps array so a contended reading
    // self-identifies from the artifact alone.
    val prev = prevRecord(currentRound = roundNumber)
    // self-adjudication under host contention (VERDICT r10 task 1):
    // a row whose min-rep ran at load > threshold or > 3x the prev
    // round's CPU is re-measured ONCE after a load backoff; if the
    // re-run is clean it replaces the tainted record. Under SUSTAINED
    // contention (backoff budget drains without the load dropping) the
    // re-run is skipped — it would re-measure the same noise — and the
    // row stays stamped tainted in the artifact so no reader mistakes
    // a contended reading for a regression.
    var backoffBudgetS = 180L
    var paceBudgetS =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PACE_S", "1200").toLong
    // let earlier bursts decay before each REP (see PaceLoadThreshold)
    // — 1-min load halves in ~40 s idle, so most waits are short and
    // the shared budget bounds the worst case
    def pace(): Unit =
      while (paceBudgetS > 0 && loadAvg() > PaceLoadThreshold) {
        val w = math.min(5L, paceBudgetS)
        Thread.sleep(w * 1000)
        paceBudgetS -= w
      }
    val results = headline.filter(qs.contains).map { name =>
      val storage = storageSnap()
      // the pinned-aware sweep: session-scoped shared stages (tfStage)
      // are lazily-checkpointed with truncated lineage — sweeping them
      // doesn't slow the next consumer, it fails it (all-FAIL
      // search_hybrid_rrf/text_keyword_topk, round 15)
      def unpersistAll(): Unit =
        graft.operators.Checkpoints.unpersistUnpinned(spark)
      def once(): QRes = {
        val r = measure(name, 3, loadAvg _, procCpuNanos _,
          () => qs(name)(spark, sfDir).count(), pace _,
          gcMillis _, jitMillis _, heapUsedMb _)
        // drop blocks a query persisted/checkpointed (cluster-cc
        // rounds, pipeline dup-id sets): lingering blocks from one
        // query must not pollute a later query's measurement in this
        // 40-query JVM
        unpersistAll()
        r
      }
      val first = once()
      val prevCpu = prev.cpu.get(name)
      val (r, rerun) =
        if (!taintedRes(first, prevCpu)) (first, false)
        else {
          System.err.println(f"[bench] $name: TAINTED (min-rep load/cpu " +
            f"vs threshold $TaintLoadThreshold%.1f / $TaintCpuRatio%.1fx prev cpu) — " +
            "backing off")
          val quieted = taintBackoff(loadAvg _,
            () => backoffBudgetS, s => backoffBudgetS -= s)
          if (!quieted) {
            System.err.println(s"[bench] $name: host still contended after " +
              "backoff — keeping the tainted record, skipping the re-run")
            (first, false)
          } else {
            val second = once()
            // prefer a clean VALID record; an all-FAIL re-run (wall<0,
            // which taintedRes cannot flag — no ok reps) must never
            // replace a valid-but-tainted measurement; two tainted
            // valid records → the faster
            val firstValid = first.wall >= 0
            val secondValid = second.wall >= 0
            if (secondValid && !taintedRes(second, prevCpu)) (second, true)
            else if (!firstValid && secondValid) (second, true)
            else if (firstValid && secondValid && second.wall < first.wall)
              (second, true)
            else (first, true)
          }
        }
      val taint = taintedRes(r, prevCpu)
      System.err.println(
        f"[bench] $name%-24s ${r.wall}%8.2fs cpu=${r.cpu}%8.2fs load=${r.load}%5.1f rows=${r.rows}" +
          (if (taint) "  TAINTED" else if (rerun) "  (rerun)" else "") +
          (if (firstRepBlown(r)) "  FIRST-REP-BLOWN" else ""))
      (r, taint, rerun, storage)
    }
    def jmap(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val res = results.map(_._1)
    // ---- end-of-run fresh-JVM requeue (VERDICT r17 task 1) ----
    // two rounds running, the headline regression was a host-state
    // phantom that a fresh JVM contradicted (r16 collapse, r17 q22
    // 6.64x with 102 JIT-s in rep 1). Flag the suspects from the
    // in-run telemetry, re-measure them ONCE in a single fresh forked
    // JVM, and record BOTH values: the headline takes the min (a
    // fresh-JVM rep is just a better-isolated rep under the min-of-N
    // convention), `requeued`/`requeued_orig` keep the adjudication
    // readable from the artifact alone.
    val churnNames = res.filter(r => churned(r, prev.cpu.get(r.name))).map(_.name)
    val growthNames = res.filter(repGrowth).map(_.name)
    val over2xNames = res.filter(r => r.wall >= 0 &&
      prev.wall.get(r.name).exists(pw => pw > 0 && r.wall > 2.0 * pw)).map(_.name)
    // severity per candidate, for worst-first selection under the cap
    // (VERDICT r19 task 1 — see [[requeueCandidates]]/[[rankRequeue]])
    val (requeueNames, requeueDropped) =
      rankRequeue(requeueCandidates(res, prev.wall, prev.cpu))
    if (requeueDropped.nonEmpty)
      System.err.println(s"[bench] requeue cap $MaxRequeue reached — " +
        s"NOT requeued (recorded in requeue_dropped): ${requeueDropped.mkString(", ")}")
    // fixed (requeue-independent) artifact pieces, computed once
    val ljson = jmap(res.map(r => r.name -> f"${r.load}%.2f"))
    val rjson = jmap(res.map(r => r.name -> repsJson(r.reps)))
    // first-rep wall/cpu as FIRST-CLASS dicts + the blown-row list
    // (VERDICT r16 task 6: min-of-3 hid a 71 s first rep)
    def firstOf(r: QRes)(f: Rep => Double): String =
      r.reps.headOption.filterNot(_.failed).map(x => f"${f(x)}%.3f").getOrElse("-1.0")
    val fwjson = jmap(res.map(r => r.name -> firstOf(r)(_.wall)))
    val fcjson = jmap(res.map(r => r.name -> firstOf(r)(_.cpu)))
    val firstBlownNames = res.filter(firstRepBlown).map(_.name)
    // min-rep GC seconds + the pre-row storage snapshot, so a repeat of
    // the r16 inflation episode names its mechanism from the JSON alone
    val gjson = jmap(res.map { r =>
      val ok = r.reps.filterNot(_.failed)
      r.name -> (if (ok.isEmpty) "-1.0" else f"${ok.minBy(_.wall).gc}%.2f")
    })
    val sjson = jmap(results.map { case (r, _, _, (n, mb, pin)) =>
      r.name -> f"[$n%d,$mb%.0f,$pin%d]" })
    val totalFirstRep = firstRepTotal(res)
    val loadMax = if (res.nonEmpty) res.map(_.load).max else -1.0
    val taintedNames = results.filter(_._2).map(_._1.name)
    val rerunNames = results.filter(_._3).map(_._1.name)
    def jarr(xs: Seq[String]): String = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-query times from the previous round's QUIETEST record, so a
    // round-over-round regression is visible in the artifact itself
    // instead of requiring a by-hand diff of two files
    val prevJson = prev.wall.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val loadMaxStr = f"$loadMax%.2f"

    /** The complete record for one emission phase. `adjudicated:false`
      * (phase 1, `requeue_pending` lists what is ABOUT to be forked)
      * becomes `adjudicated:true` with the requeue blocks filled in
      * (phase 2); `requeue_failed` carries the child's failure reason
      * or null. */
    def fullJsonFor(outcome: RequeueOutcome, adjudicated: Boolean): String = {
      // wall and cpu take their mins INDEPENDENTLY (review r18): the
      // churn signature is exactly "wall fine, CPU inflated", so gating
      // the fresh CPU on the fresh WALL also winning would keep the
      // inflated CPU in the record — poisoning next round's prev.cpu
      // baseline, the very value the churn check compares against.
      // Wall adjustment goes through the shared adjustedWall rule.
      val adjusted = res.map { r =>
        outcome.vals.get(r.name) match {
          case Some((_, c, rows)) =>
            r.copy(
              wall = adjustedWall(r, outcome),
              cpu = if (c >= 0 && (r.cpu < 0 || c < r.cpu)) c else r.cpu,
              rows = if (r.rows < 0) rows else r.rows)
          case _ => r
        }
      }
      val replacedNames = adjusted.zip(res).collect {
        case (a, o) if a.wall != o.wall || a.cpu != o.cpu => o.name
      }
      val qjson = jmap(adjusted.map(r => r.name -> f"${r.wall}%.3f"))
      val cjson = jmap(adjusted.map(r => r.name -> f"${r.cpu}%.2f"))
      val total = adjusted.map(_.wall).sum
      // requeue blocks: fresh-JVM values (full per-rep detail), the
      // in-run values they adjudicate, and the flag lists
      val requeuedJson = outcome.detail.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val requeuedOrigJson = jmap(res.filter(r => outcome.vals.contains(r.name))
        .map(r => r.name -> f"[${r.wall}%.3f,${r.cpu}%.2f]"))
      // escape for a one-line JSON string: backslash, quote, AND
      // control characters — exception messages carry newlines, and a
      // raw \n inside the value would break both the committed file's
      // parse and the "slim line is the parseable tail" guarantee, in
      // exactly the failure path this field exists to make loud
      // (review r19)
      val failJson = outcome.failReason
        .map(r => "\"" + r.replace("\\", "\\\\").replace("\"", "'")
          .replaceAll("\\p{Cntrl}", " ") + "\"")
        .getOrElse("null")
      s"""{"metric":"total","value":$total,"value_first":${f"$totalFirstRep%.3f"},"unit":"sec","round":$roundNumber,"n_queries":${res.size},"adjudicated":$adjudicated,"requeue_pending":${jarr(if (adjudicated) Nil else requeueNames)},"requeue_failed":$failJson,"load_max":$loadMaxStr,"taint_load_threshold":$TaintLoadThreshold,"taint_cpu_ratio":$TaintCpuRatio,"tainted":${jarr(taintedNames)},"rerun":${jarr(rerunNames)},"first_flagged":${jarr(firstBlownNames)},"churn_flagged":${jarr(churnNames)},"growth_flagged":${jarr(growthNames)},"over2x_flagged":${jarr(over2xNames)},"requeue_dropped":${jarr(requeueDropped)},"requeue_replaced":${jarr(replacedNames)},"requeued":$requeuedJson,"requeued_orig":$requeuedOrigJson,"queries":$qjson,"cpu":$cjson,"load":$ljson,"first_wall":$fwjson,"first_cpu":$fcjson,"gc":$gjson,"storage":$sjson,"reps":$rjson,"jvm_start":$jvmStart,"jvm_end":${jvmJson()},"prev":$prevJson,"prev_source":"${prev.source}","sf":"$sfDir"}"""
    }

    /** Slim stdout line: total + the per-query wall dict — ~1.4 KB at
      * 50 queries but PAST the harness's 2000-char stdout tail at
      * today's 134 (which is why BENCH_r15..r18 all read parsed:null
      * even at rc 0). It stays for humans/greppability; the line the
      * harness tail is guaranteed to END on is the size-bounded
      * [[microLine]] printed after it. */
    def slimJsonFor(outcome: RequeueOutcome): String = {
      val adjusted = res.map(r => r.copy(wall = adjustedWall(r, outcome)))
      val qjson = jmap(adjusted.map(r => r.name -> f"${r.wall}%.3f"))
      val total = adjusted.map(_.wall).sum
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${res.size},"load_max":$loadMaxStr,"tainted":${jarr(taintedNames)},"first_flagged":${jarr(firstBlownNames)},"growth_flagged":${jarr(growthNames)},"requeued":${jarr(requeueNames)},"queries":$qjson,"sf":"$sfDir"}"""
    }

    // The full record goes to a COMMITTED repo file so no future round
    // depends on the stdout window at all: bench/bench_r{N}.json is
    // the durable artifact and the preferred `prev` source — or its
    // first free round-suffixed sibling when the base name is already
    // committed (see [[resolveBenchOut]]), resolved ONCE so both emit
    // phases write the same file. SPARK_GRAFT_BENCH_OUT redirects it
    // (taint-injection test runs must not clobber the round-close
    // record). commitRecord returns the ACTUAL written path so the
    // micro line's pointer and the write share one truth — a
    // separately-derived relative path disagreed with the absolute
    // write target, and a failed write must not be advertised as a
    // record (review r19 pass 5).
    lazy val benchOut: java.io.File =
      sys.env.get("SPARK_GRAFT_BENCH_OUT").map(new java.io.File(_))
        .getOrElse {
          val dir = new java.io.File("/root/repo/bench")
          dir.mkdirs()
          resolveBenchOut(dir, roundNumber)
        }
    def commitRecord(fullJson: String): Option[String] = try {
      val out = benchOut
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(fullJson) finally w.close()
      System.err.println(s"[bench] full record written to $out")
      Some(out.getAbsolutePath)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARNING: could not write bench file: $e")
      None
    }

    // the ONE outcome-min wall adjustment, shared by the full, slim and
    // micro emissions (review r19 pass 5: three hand-rolled copies of
    // this rule would desynchronize the micro total from the record the
    // way the r18 wall/cpu-min review almost did)
    def adjustedWall(r: QRes, outcome: RequeueOutcome): Double =
      outcome.vals.get(r.name) match {
        case Some((w, _, _)) if w >= 0 && (r.wall < 0 || w < r.wall) => w
        case _ => r.wall
      }

    def emitPhase(outcome: RequeueOutcome, adjudicated: Boolean): Unit = {
      val full = fullJsonFor(outcome, adjudicated)
      // commit the durable file FIRST: its stderr write-notice must not
      // land after the micro line — the harness interleaves streams
      // (BENCH_r18's tail shows stderr), and the micro line must be the
      // LAST thing either stream emits in this phase. The pointer in
      // the micro line is the ACTUAL written path (or a loud marker on
      // write failure), never a separately-derived guess.
      val writtenPath = commitRecord(full)
      println(full)
      println(slimJsonFor(outcome))
      // micro line LAST in BOTH phases, so the harness's 2000-char
      // stdout tail always ends on one COMPLETE parseable JSON object
      // — a SIGKILL inside the fork leaves phase 1's micro line as the
      // tail, and at >75 queries the slim line alone no longer fits
      val adjTotal = res.map(adjustedWall(_, outcome)).sum
      println(microLine(adjTotal, res.size, roundNumber, adjudicated,
        outcome.failReason, loadMax, taintedNames.size,
        firstBlownNames.size, requeueNames.size, requeueDropped.size, sfDir,
        writtenPath.getOrElse("(record write FAILED)"),
        totalFirst = totalFirstRep))
      Console.out.flush()
      System.err.flush()
    }

    // ---- two-phase emit around the fork (VERDICT r18 task 1) ----
    if (requeueNames.isEmpty) emitPhase(RequeueOutcome.empty, adjudicated = true)
    else twoPhaseEmit(
      requeueNames,
      emitPhase1 = () => emitPhase(RequeueOutcome.empty, adjudicated = false),
      fork = names => {
        System.err.println(s"[bench] requeuing in a fresh JVM: " +
          names.mkString(", ") +
          s" (churn=${churnNames.size} growth=${growthNames.size} " +
          s"over2x=${over2xNames.size})")
        // pre-fork hygiene (VERDICT r18 task 1b): sweep the parent's
        // unpinned persisted blocks and ask for a GC so the parent's
        // ~full-run working set and the child never peak together
        graft.operators.Checkpoints.unpersistUnpinned(spark)
        System.gc()
        freshJvmMeasure(names)
      },
      emitPhase2 = outcome => emitPhase(outcome, adjudicated = true))
    spark.stop()
  }
}
