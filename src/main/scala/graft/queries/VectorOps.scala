package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane LSH-bucketed variant as the scale path, and
  * cosine-threshold near-dup pairs.
  *
  * Scale design (100 TB): brute force is a broadcast of the (small)
  * query set against the full corpus — a narrow map + per-partition
  * top-k (no full sort); the LSH path buckets the corpus by signature
  * so candidate generation is an equi-join on bucket keys. All vector
  * math is `zip_with`/`aggregate` over array columns in doubles —
  * codegen'd, no UDFs.
  */
object VectorOps extends Serializable {

  // Products are quantized to the 2^-20 binary grid before summation:
  // each term becomes an integer-valued double (|p·2^20| < 2^31), so
  // the sum of ≤64 terms is EXACT and therefore order-independent —
  // Spark's in-array fold and DuckDB's arbitrary-order SUM produce
  // bit-identical dots, eliminating round()-boundary flakes at the
  // oracle. 2^-20 quantization error (~1e-6 per term) is far below the
  // 1e-6 output rounding.
  private val Q = 1048576.0 // 2^20

  /** Embedding scan, fanned out when the input cannot feed the cores
    * (single-row-group bench parquet plans ONE task, so every fused
    * scoring/encoding kernel ran single-threaded — guide §2.5 input-skew
    * rule; [[graft.operators.FanOut]] is a no-op at scan parallelism ≥
    * cores, i.e. on any real multi-file corpus). Filters above the
    * fan-out (the `vec_id < batch` query-side prune) still push through
    * the exchange into the parquet scan — PushDownPredicates moves
    * deterministic predicates past RepartitionOperation nodes. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.operators.FanOut(s.read.parquet(s"$dir/embeddings.parquet"))
      // float32 → double once, up front: both engines then do identical
      // double arithmetic (float accumulation would diverge from the oracle)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("norm", expr(
        s"sqrt(aggregate(v, 0.0d, (a, x) -> a + round(x * x * ${Q}d)) / ${Q}d)"))

  private def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    (aggregate(zip_with(va, vb, (x, y) => round(x * y * lit(Q))), lit(0.0),
      (acc, x) => acc + x) / lit(Q)) / (na * nb)

  /** Query set: vec_id < 5 — stands in for an external query batch. */
  /** ANN query batch bound: `vec_id < queryIds(s)`. The conf
    * `spark.graft.ann.queryBatch` is the ad-hoc knob; the DuckDB
    * oracles unroll the DEFAULT batch, so the gate always runs the
    * default (the `spark.graft.pagerank.iters` doctrine). The probed
    * scorers' per-row work is batch-size-independent (tablesByList),
    * so a 10k-query recall-eval batch changes a broadcast size, not
    * the plan shape. */
  private val QueryIdsDefault = 5
  private def queryIds(s: SparkSession): Int =
    s.conf.get("spark.graft.ann.queryBatch", QueryIdsDefault.toString).toInt
  private val TopK = 10

  /** Exact per-query top-k of a scored candidate table. A bare
    * `Window.partitionBy(query_id)` funnels every query's FULL
    * candidate set through one task — at 100 TB that is one task per
    * query scanning corpus-sized scores. Instead each input partition
    * keeps only its local top-k per query via a bounded heap (the
    * global top-k is a subset of the union of local top-ks), so the
    * exact ranking window sees ≤ k × nQueries × numPartitions rows.
    * Heap order mirrors the final tie-break (sim desc, match_id asc)
    * exactly, so results are identical to the naive window. */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val pruned = scored.select(col("query_id"), col("match_id"), col("sim"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // per-query min-heap of the current k best; head = worst kept
        val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
          case (sim, id) => (-sim, id)
        }
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (q, m, sim) =>
          val h = heaps.getOrElseUpdate(q,
            scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
          if (h.size < k) h.enqueue((sim, m))
          else {
            val (wSim, wId) = h.head
            // better = higher sim, or same sim with lower match_id
            if (sim > wSim || (sim == wSim && m < wId)) {
              h.dequeue(); h.enqueue((sim, m))
            }
          }
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (sim, m) => (q, m, sim) }
        }
      }
      .toDF("query_id", "match_id", "sim")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("match_id").asc)
    pruned.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "match_id", "sim", "rk")
      .orderBy("query_id", "rk")
  }
  /** IVF coarse quantizer: one centroid per `CentroidStep` ids (~17
    * lists at sf0.01, ~65 at sf0.1); queries probe `NProbe` lists. */
  private val CentroidStep = 31
  private val NProbe = 4

  /** PQ defaults: 8 subspaces × 16 centroids × 2 Lloyd iterations —
    * 8 code bytes per 64-float vector. */
  private val PqM = 8
  private val PqK = 16
  private val PqIters = 2
  private val PqShortlist = 50

  /** Trained-quantizer k as SQL: exactly the sampled quantizer's list
    * count (corpus-proportional), so the trained-vs-sampled recall A/B
    * differs only in centroid PLACEMENT — equal lists, equal nprobe. */
  private val TrainedKSql =
    s"(SELECT count(*) FROM embeddings WHERE vec_id % $CentroidStep = 0)"

  /** Brute-force cosine top-k (the exact truth set): broadcast query
    * vectors, narrow per-row score, per-query top-k via bounded heap +
    * window (complete deterministic order: rounded score desc, id
    * asc). Shared by vec_topk_bruteforce and the recall evaluator. */
  private def bruteforceTopK(s: SparkSession, dir: String,
      keepMatches: DataFrame => DataFrame = identity): DataFrame = {
    val e = emb(s, dir)
    val q = queryBatchDF(s, dir)
    val c = keepMatches(
      e.select(col("vec_id").as("match_id"), col("v").as("vb"), col("norm").as("nb")))
    val scored = c.join(broadcast(q))
      .filter(col("match_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
    rankTopK(scored, TopK)
  }

  /** The filtered-ANN metadata predicate: matches restricted to even
    * labels (~50% selectivity) — a stand-in for the language/source/
    * license predicates every production filtered vector search
    * carries (FAISS IDSelector, Milvus boolean filters). The keep set
    * applies as a semi join on the id column `keyCol`, AFTER list
    * assignment: the index is built unfiltered and the filter prunes
    * at query time, the standard post-filter-in-index semantics. */
  private def evenLabelKeep(s: SparkSession, dir: String, keyCol: String)
      : DataFrame => DataFrame =
    predKeep(s, dir, keyCol, col("label") % 2 === 0)

  /** Generalized metadata keep-set: semi join `keyCol` against the
    * vec_ids satisfying `pred` — [[evenLabelKeep]] with the predicate
    * as a parameter (the adaptive filtered path takes arbitrary
    * predicates). */
  private def predKeep(s: SparkSession, dir: String, keyCol: String,
      pred: org.apache.spark.sql.Column): DataFrame => DataFrame = { d =>
    val keep = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(pred).select(col("vec_id").as("__kid"))
    d.join(keep, d(keyCol) === col("__kid"), "left_semi")
  }

  /** Adaptive probe width for FILTERED ANN (VERDICT r18 task 3).
    * Post-filter-in-index search prunes candidates AFTER list
    * assignment, so a selective predicate empties the probed lists:
    * the expected number of qualifying candidates in p probed lists is
    * selectivity × avgListSize × p, and when that falls under k the
    * recall against the FILTERED truth collapses — the canonical
    * filtered-ANN failure mode a skewed-metadata corpus hits (FAISS /
    * Milvus widen the probe or flip to brute force the same way).
    *
    * The rule (pure arithmetic, spec-pinned in FilteredAnnSpec, swept
    * at 100k scale by FilteredAnnProbe):
    *  - expected candidates must reach [[AdaptiveSafety]]·k: probe the
    *    smallest p ≥ baseNprobe with selectivity·avgListSize·p ≥
    *    safety·k;
    *  - None (= fall back to exact FILTERED brute force) when the
    *    whole corpus is too thin (selectivity·N < safety·k — no probe
    *    width can fill k confidently), or when the required p exceeds
    *    [[AdaptiveMaxProbeFrac]] of the lists — at that width the
    *    index's pruning is mostly gone while its recall risk remains
    *    (the true kept neighbors of a sparse predicate scatter across
    *    ALL lists, not the nearest ones), and the filtered brute
    *    force scores only selectivity·N rows anyway. */
  private[graft] val AdaptiveSafety = 3.0
  private[graft] val AdaptiveMaxProbeFrac = 0.3
  private[graft] def adaptiveNprobe(selectivity: Double, avgListSize: Double,
      nLists: Int, baseNprobe: Int, k: Int,
      safety: Double = AdaptiveSafety,
      maxProbeFrac: Double = AdaptiveMaxProbeFrac): Option[Int] = {
    require(selectivity >= 0.0 && selectivity <= 1.0,
      s"selectivity must be in [0,1], got $selectivity")
    require(nLists >= 1 && avgListSize > 0 && baseNprobe >= 1 && k >= 1)
    val perList = selectivity * avgListSize
    val need = safety * k
    if (perList <= 0.0 || perList * nLists < need) None
    else {
      val p = math.max(baseNprobe, math.ceil(need / perList).toInt)
      if (p > math.max(baseNprobe.toDouble, maxProbeFrac * nLists)) None
      else Some(math.min(nLists, p))
    }
  }

  /** Fixed-nprobe filtered search over an arbitrary predicate — the
    * spec/probe seam for demonstrating the recall collapse the
    * adaptive rule prevents (the gate row keeps [[annIvfFiltered]]'s
    * even-label form). */
  private[graft] def annIvfFilteredWith(s: SparkSession, dir: String,
      iters: Int, nprobe: Int, pred: org.apache.spark.sql.Column): DataFrame =
    annIvfCore(s, dir, trainedCents(s, dir, iters), nprobe,
      quantKey = s"trained$iters",
      keepMatches = predKeep(s, dir, "vec_id", pred))

  /** Filtered truth for an arbitrary predicate (exact brute force among
    * qualifying matches) — shared by the adaptive fallback and specs. */
  private[graft] def bruteforceFilteredWith(s: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): DataFrame =
    bruteforceTopK(s, dir, predKeep(s, dir, "match_id", pred))

  /** Filtered trained-IVF ANN with the adaptive probe rule applied at
    * PLAN time: selectivity = keep-count / corpus-count (one aggregate
    * collect — the a12 plan-time-scalar doctrine), lists from the
    * trained quantizer. Some(p) probes p lists through the standard
    * post-filter path; None falls back to the exact filtered brute
    * force (recall 1.0 by construction, cost selectivity·N scored rows
    * per query). The fixed-nprobe gate rows (`vec_ann_ivf_filtered`,
    * `vec_recall_eval_filtered`) are deliberately unchanged — this is
    * the production entry point for skewed-metadata corpora. */
  def annIvfFilteredAdaptive(s: SparkSession, dir: String,
      iters: Int = KmeansIters, baseNprobe: Int = NProbe,
      pred: org.apache.spark.sql.Column = col("label") % 2 === 0): DataFrame =
    adaptiveDecision(s, dir, iters, baseNprobe, pred) match {
      case Some(p) => annIvfFilteredWith(s, dir, iters, p, pred)
      case None => bruteforceFilteredWith(s, dir, pred)
    }

  /** Session-scoped memo of the adaptive dispatch's plan-time scalars
    * (VERDICT r20 task 3): the (keep, total) selectivity aggregate is a
    * deterministic function of the corpus and the predicate — an index
    * STATISTIC in the same lifecycle tier as the trained quantizer
    * ([[centsMemo]]), so re-collecting it per query call only re-ran an
    * identical 1-row aggregate. Keyed by the predicate's expression
    * string (stable for identical Column constructions; a novel
    * predicate simply pays its own first collection). */
  private val adaptiveStatsMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), (Long, Long)]()

  /** The Some(p)/None decision [[annIvfFilteredAdaptive]] will take for
    * `pred`, exposed so specs/probes can pin the dispatch without
    * duplicating the plan-time scalar collection. */
  private[graft] def adaptiveDecision(s: SparkSession, dir: String,
      iters: Int, baseNprobe: Int,
      pred: org.apache.spark.sql.Column): Option[Int] = {
    graft.operators.Checkpoints.purgeStopped(adaptiveStatsMemo)(_._1)
    val (keep, total) = adaptiveStatsMemo.computeIfAbsent(
      (s, dir, pred.toString), { _ =>
        val r = s.read.parquet(s"$dir/embeddings.parquet").agg(
          sum(when(pred, 1L).otherwise(0L)).as("keep"),
          count(lit(1)).as("total")).head()
        // SUM over zero rows is null — read it as 0 so the empty-corpus
        // case stays on the honest brute-force fallback below
        (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
      })
    // empty corpus: avgListSize would be 0 and adaptiveNprobe's domain
    // require would throw — the honest decision is the brute-force
    // fallback, which returns the empty result (review r19)
    if (total == 0) None
    else {
      val cents = trainedCents(s, dir, iters)
      adaptiveNprobe(keep.toDouble / total,
        total.toDouble / cents.length, cents.length, baseNprobe, TopK)
    }
  }

  /** Filtered trained-IVF ANN: probe as [[annIvfTrained]], candidates
    * restricted by [[evenLabelKeep]] before exact scoring — top-k
    * among matches SATISFYING the predicate. With ~50% selectivity
    * and per-list uniform labels, nprobe lists still hold ≥ k
    * qualifying candidates; heavily selective predicates want a
    * larger nprobe — exactly the production tuning
    * `vec_recall_eval_filtered` measures. */
  def annIvfFiltered(s: SparkSession, dir: String, iters: Int,
      nprobe: Int): DataFrame =
    annIvfCore(s, dir, trainedCents(s, dir, iters), nprobe,
      quantKey = s"trained$iters",
      keepMatches = evenLabelKeep(s, dir, "vec_id"))

  /** recall@k of an ANN result against the brute-force truth — the
    * metric a production pipeline tracks when tuning plane count /
    * nprobe. The semi join on (query, match) keys is truth-sized
    * (queryBatch × k rows), so the eval itself is never the bottleneck —
    * the inputs are. Missing queries (empty bucket) score recall 0. */
  private def recallEval(truthFull: DataFrame, annFull: DataFrame): DataFrame = {
    val truth = truthFull.select("query_id", "match_id")
    val ann = annFull.select("query_id", "match_id")
    val hits = truth.join(ann, Seq("query_id", "match_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / TopK, 6)
          .as("recall_at_k"))
      .orderBy("query_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "vec_topk_bruteforce" -> ((s, dir) => bruteforceTopK(s, dir)),

    // ANN quality evaluation: recall@k of the LSH path against the
    // brute-force truth — the metric a production pipeline tracks when
    // tuning plane count / nprobe. Both sides are engine queries; the
    // semi join on (query, match) keys is truth-sized (queryBatch × k
    // rows), so the eval itself is never the bottleneck — the inputs
    // are. Missing queries (empty LSH bucket) score recall 0.
    "vec_recall_eval" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir), annLsh(s, dir, 8))),

    // same evaluator over the IVF path: recall@k as a function of
    // nprobe is THE tuning curve for an inverted-file index
    "vec_recall_eval_ivf" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir), annIvf(s, dir, CentroidStep, NProbe))),

    // the trained-quantizer A/B at equal nprobe: compare with
    // vec_recall_eval_ivf to read the recall@k lift of k-means
    // centroids over the id-step sample
    "vec_recall_eval_trained" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir),
        annIvfTrained(s, dir, KmeansIters, NProbe))),

    // Cosine-threshold near-duplicate pairs (embedding near-dup dedup):
    // block on sign-bucket of the first hyperplane to avoid the full
    // cross join? No — threshold 0.4 is far below any blocking bound,
    // so this is the exact all-pairs baseline (ids a<b).
    "vec_neardup_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val a = e.select(col("vec_id").as("ida"), col("v").as("va"), col("norm").as("na"))
      val b = e.select(col("vec_id").as("idb"), col("v").as("vb"), col("norm").as("nb"))
      a.join(b, col("ida") < col("idb"))
        .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
        .filter(col("sim") >= 0.4)
        .select("ida", "idb", "sim")
        .orderBy("ida", "idb")
    }),

    // LSH-bucketed ANN: 8 deterministic pseudo-random hyperplanes
    // (coefficients from a hash of (plane, dim)), signature = sign
    // bits; candidates share a signature bucket; top-k within bucket.
    // Approximate-by-construction but fully deterministic (quantized
    // projections, splitmix-derived coefficients) ⇒ full SQL oracle.
    "vec_ann_lsh" -> ((s, dir) => annLsh(s, dir, 8)),

    // Bucketed sibling of vec_neardup_pairs: banded hyperplane LSH
    // candidate generation + exact verification, same output contract.
    // See [[neardupLsh]] for the honest threshold-vs-pruning math.
    "vec_neardup_lsh" -> ((s, dir) =>
      neardupLsh(s, dir, 0.4, 5, 102).orderBy("ida", "idb")),

    // IVF (inverted-file) ANN: deterministic coarse quantizer
    // (centroids = vectors with vec_id % step == 0, so centroid count
    // scales with the corpus), every vector assigned to its nearest
    // centroid's list, queries probe the nprobe nearest lists and score
    // exactly inside them. Fully deterministic ⇒ full SQL oracle.
    "vec_ann_ivf" -> ((s, dir) => annIvf(s, dir, CentroidStep, NProbe)),

    // IVF with the TRAINED k-means quantizer (the production form —
    // FAISS-style IVF trains its coarse quantizer; the id-step sample
    // above is the cheap bootstrap). Oracle = the unrolled-Lloyd CTE
    // chain feeding the same IVF SQL skeleton.
    "vec_ann_ivf_trained" -> ((s, dir) =>
      annIvfTrained(s, dir, KmeansIters, NProbe)),

    // product-quantized ADC top-k — see [[annPq]]; m=8 subspaces × 16
    // centroids (8 code bytes per vector, 32× compression)
    "vec_ann_pq" -> ((s, dir) => annPq(s, dir, PqM, PqK, PqIters)),

    // ADC shortlist + exact re-rank — the production IVF-PQ answer
    // path; see [[annPqRerank]]
    "vec_ann_pq_rerank" -> ((s, dir) =>
      annPqRerank(s, dir, PqM, PqK, PqIters, PqShortlist)),

    // the composed IVF × PQ index: trained coarse lists + PQ codes
    // keyed by list, nprobe-pruned ADC scan, exact rerank — see
    // [[annIvfPq]]
    "vec_ann_ivfpq" -> ((s, dir) =>
      annIvfPq(s, dir, PqM, PqK, PqIters, NProbe, PqShortlist)),

    // recall@k of the composed index against the brute-force truth —
    // the number that says what nprobe-pruning costs ON TOP of PQ
    // compression (compare: vec_recall_eval_trained = exact scan of
    // the same probed lists, vec_ann_pq_rerank's spec-pinned 0.70 =
    // flat ADC over the full corpus)
    "vec_recall_eval_ivfpq" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir),
        annIvfPq(s, dir, PqM, PqK, PqIters, NProbe, PqShortlist))),

    // residual-encoded IVF-PQ (FAISS by_residual=true) — codebooks
    // quantize v − centroid(list); see [[annIvfPqRes]]
    "vec_ann_ivfpq_res" -> ((s, dir) =>
      annIvfPqRes(s, dir, PqM, PqK, PqIters, NProbe, PqShortlist)),

    // the residual-vs-raw recall A/B at equal code size, lists and
    // nprobe — reads directly against vec_recall_eval_ivfpq
    "vec_recall_eval_ivfpq_res" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir),
        annIvfPqRes(s, dir, PqM, PqK, PqIters, NProbe, PqShortlist))),

    // 8-bit scalar quantization flat scan (FAISS SQ8) — the 8×
    // compression / near-exact-recall point of the quantization
    // family; see [[annSq8]]
    "vec_ann_sq8" -> ((s, dir) => annSq8(s, dir)),

    // recall@k of the SQ8 scan against the full-precision truth —
    // reads against vec_ann_pq's 32×-compression recall
    "vec_recall_eval_sq8" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir), annSq8(s, dir))),

    // the composed IVF × SQ8 index (FAISS "IVF{k},SQ8"): trained
    // lists key the byte-code table, nprobe-pruned asymmetric scan —
    // see [[annIvfSq8]]
    "vec_ann_ivfsq8" -> ((s, dir) => annIvfSq8(s, dir, NProbe)),

    // probed-list loss is the ONLY loss at SQ8 precision: reads
    // directly against vec_recall_eval_trained (exact scan of the
    // same lists)
    "vec_recall_eval_ivfsq8" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir), annIvfSq8(s, dir, NProbe))),

    // FILTERED vector search (round 18) — the metadata-predicate ANN
    // every production retrieval stack needs (language/source/license
    // filters): trained-IVF probe with candidates restricted to the
    // predicate BEFORE exact scoring; see [[annIvfFiltered]]
    "vec_ann_ivf_filtered" -> ((s, dir) =>
      annIvfFiltered(s, dir, KmeansIters, NProbe)),

    // recall@k of the filtered search against the FILTERED brute-force
    // truth (top-k among qualifying matches) — the nprobe-vs-
    // selectivity tuning curve of filtered ANN
    "vec_recall_eval_filtered" -> ((s, dir) =>
      recallEval(bruteforceTopK(s, dir, evenLabelKeep(s, dir, "match_id")),
        annIvfFiltered(s, dir, KmeansIters, NProbe))),

    // ADAPTIVE filtered ANN — the production entry point (round 19's
    // adaptiveNprobe rule, oracle-gated in round 20 per VERDICT r19
    // task 2), on a moderate-selectivity predicate that exercises the
    // Some(p) branch with a genuinely WIDENED probe (4 → 5 lists at
    // every committed SF); the oracle twins the dispatch itself
    "vec_ann_adaptive" -> ((s, dir) =>
      annIvfFilteredAdaptive(s, dir, pred = AdaptiveModeratePred)),

    // the None branch: a predicate sparse enough that no probe width
    // can confidently fill k — the rule falls back to exact FILTERED
    // brute force (recall 1.0 by construction), and the oracle's
    // dispatch twin takes the same branch
    "vec_ann_adaptive_sparse" -> ((s, dir) =>
      annIvfFilteredAdaptive(s, dir, pred = AdaptiveSparsePred)),

    // recall@k of the adaptive path against the FILTERED truth for the
    // moderate predicate — the number the r19 probe showed collapsing
    // to 0.11 under fixed nprobe at high selectivity pressure, held at
    // 1.0 by the widened probe
    "vec_recall_eval_adaptive" -> ((s, dir) =>
      recallEval(bruteforceFilteredWith(s, dir, AdaptiveModeratePred),
        annIvfFilteredAdaptive(s, dir, pred = AdaptiveModeratePred))),

    // Deterministic Lloyd k-means over the embedding corpus (the
    // clustering stage of SemDeDup-style semantic dedup, Abbas et al.
    // 2023): seeds = the k lowest vec_ids, every coordinate grid-
    // snapped to the 2^-20 lattice up front so distance terms and
    // centroid means are bit-identical in both engines ⇒ full SQL
    // oracle (3 unrolled Lloyd iterations in DuckDB).
    "vec_kmeans" -> ((s, dir) =>
      kmeansAssign(s, dir, KmeansK, KmeansIters).orderBy("vec_id")),

    // SemDeDup: k-means cluster, then exact quantized-cosine pairs
    // WITHIN each cluster only; a vector is dropped when a smaller-id
    // cluster-mate sits above the similarity threshold. Output is the
    // full corpus with its cluster and keep/drop verdict.
    "vec_semdedup" -> ((s, dir) =>
      semdedup(s, dir, KmeansK, KmeansIters, SemDedupThreshold)))

  /** k-means defaults: at sf0.01 (500 vecs) k=8 gives ~60-vector
    * clusters; in production k scales as N/targetClusterSize so the
    * within-cluster SemDeDup pair join stays bounded. */
  private val KmeansK = 8
  private val KmeansIters = 3
  private val SemDedupThreshold = 0.4

  /** Deterministic Lloyd k-means: `iters - 1` centroid updates, then
    * one final assignment pass. Returns (vec_id, cluster, dist) where
    * `cluster` is the seed vec_id of the centroid (a stable label that
    * never needs an index remap) and `dist` is the squared L2 distance
    * on the 2^-20 grid, rounded to 6.
    *
    * Determinism: every coordinate is snapped to the 2^-20 lattice
    * first, so each squared-difference term `round((x-c)²·2^20)` is an
    * integer-valued double and per-vector distance sums are EXACT
    * (order-independent); centroid means divide an exact lattice sum
    * by an exact count, giving bit-identical doubles in Spark and the
    * oracle's unrolled SQL. Ties go to the lowest centroid id in both.
    *
    * Scale (100 TB): centroids are k×64 doubles — collected and
    * broadcast each iteration (same tier as [[annIvf]]'s coarse
    * quantizer); each update is ONE narrow pass emitting k×64 partial
    * sums per partition (the per-key shuffle is k×64×partitions tiny
    * rows, never the corpus), and the final assignment is one narrow
    * map. The corpus itself is localCheckpointed once and re-read
    * `iters` times from block storage, never re-parsed from parquet. */
  def kmeansAssign(s: SparkSession, dir: String, k: Int, iters: Int): DataFrame = {
    import s.implicits._
    val ds = snappedVecs(s, dir)
    val cents = kmeansLoop(s, ds, k, iters)
    val bcF = s.sparkContext.broadcast(cents)
    ds.mapPartitions { rows =>
      val cs = bcF.value
      rows.map { case (id, v) =>
        val (bi, bd) = nearest(v, cs)
        (id, cs(bi)._1, graft.functions.Num.roundHalfUp(bd / Q, 6))
      }
    }.toDF("vec_id", "cluster", "dist")
  }

  /** The trained coarse quantizer on its own: the centroids
    * [[kmeansAssign]] would assign against (seeds = k lowest vec_ids,
    * `iters − 1` Lloyd updates on the 2^-20 lattice). Feeds
    * [[annIvfTrained]]. */
  def kmeansCentroids(s: SparkSession, dir: String, k: Int,
      iters: Int): Array[(Long, Array[Double])] =
    kmeansLoop(s, snappedVecs(s, dir), k, iters)

  private def snappedVecs(s: SparkSession, dir: String): Dataset[(Long, Array[Double])] = {
    import s.implicits._
    // emb() is fanned out, and the lazy checkpoint keeps its
    // partitioning — every Lloyd pass over the blocks runs parallel
    emb(s, dir).select(col("vec_id"),
        expr(s"transform(v, x -> round(x * ${Q}d) / ${Q}d)").as("vq"))
      .localCheckpoint(false)
      .as[(Long, Array[Double])]
  }

  // argmin over broadcast centroids; strict < keeps the lowest cid on
  // ties because `cs` is sorted by cid
  private def nearest(v: Array[Double], cs: Array[(Long, Array[Double])]): (Int, Double) = {
    var bi = 0
    var bd = Double.MaxValue
    var ci = 0
    while (ci < cs.length) {
      val cv = cs(ci)._2
      var acc = 0.0
      var d = 0
      while (d < v.length) {
        val t = v(d) - cv(d)
        acc += graft.functions.Num.round0(t * t * Q)
        d += 1
      }
      if (acc < bd) { bd = acc; bi = ci }
      ci += 1
    }
    (bi, bd)
  }

  private def kmeansLoop(s: SparkSession, ds: Dataset[(Long, Array[Double])],
      k: Int, iters: Int): Array[(Long, Array[Double])] = {
    import s.implicits._
    require(iters >= 1, s"kmeans iters must be >= 1, got $iters")
    var cents: Array[(Long, Array[Double])] =
      ds.filter(col("vec_id") < k).collect().sortBy(_._1)
    val dims = cents.headOption.map(_._2.length).getOrElse(0)

    var it = 1
    while (it < iters) {
      val bc = s.sparkContext.broadcast(cents)
      // one narrow pass: per-partition per-cluster coordinate sums +
      // counts (exact lattice sums), then a k×64-key rollup
      val partials = ds.mapPartitions { rows =>
        val cs = bc.value
        val sums = Array.fill(cs.length)(new Array[Double](dims))
        val cnts = new Array[Long](cs.length)
        rows.foreach { case (_, v) =>
          val (bi, _) = nearest(v, cs)
          val sm = sums(bi)
          var d = 0
          while (d < v.length) { sm(d) += v(d); d += 1 }
          cnts(bi) += 1
        }
        cs.indices.iterator.filter(cnts(_) > 0).flatMap { ci =>
          (0 until dims).iterator.map(p => (cs(ci)._1, p, sums(ci)(p), cnts(ci)))
        }
      }.toDF("cid", "pos", "s", "n")
        .groupBy("cid", "pos")
        .agg(sum("s").as("s"), sum("n").as("n"))
        .collect()
      // empty clusters simply vanish (their seed attracted no members
      // against a duplicate seed with a lower id) — the oracle's GROUP
      // BY produces the same shrinkage
      cents = partials.groupBy(_.getLong(0)).map { case (cid, rows) =>
        val arr = new Array[Double](dims)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
        (cid, arr)
      }.toArray.sortBy(_._1)
      it += 1
    }
    cents
  }

  /** SemDeDup (Abbas et al. 2023): cluster with [[kmeansAssign]], exact
    * quantized-cosine verification WITHIN clusters only, drop a vector
    * when a lower-id cluster-mate exceeds `minSim`. The pair join is
    * an equi-join on cluster — its width is bounded by the largest
    * cluster, which production k (N/targetClusterSize) keeps constant
    * per task; the corpus is never self-joined globally. */
  def semdedup(s: SparkSession, dir: String, k: Int, iters: Int,
      minSim: Double): DataFrame = {
    val assign = kmeansAssign(s, dir, k, iters).select("vec_id", "cluster")
    val e = emb(s, dir).select(col("vec_id"), col("v"), col("norm"))
    val a = assign.join(e, "vec_id")
    val lft = a.select(col("cluster"), col("vec_id").as("ida"),
      col("v").as("va"), col("norm").as("na"))
    val rgt = a.select(col("cluster"), col("vec_id").as("idb"),
      col("v").as("vb"), col("norm").as("nb"))
    val dropped = lft.join(rgt, Seq("cluster"))
      .filter(col("ida") < col("idb"))
      .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
      .filter(col("sim") >= lit(minSim))
      .select(col("idb").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    assign.join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        coalesce(!col("dropped"), lit(true)).as("kept"))
      .orderBy("vec_id")
  }

  /** Random-hyperplane LSH ANN, parameterized by plane count (bucket
    * granularity: 2^planes buckets — tune to corpus size). */
  def annLsh(s: SparkSession, dir: String, planes: Int): DataFrame = {
    locally {
      import s.implicits._
      // deterministic pseudo-random hyperplanes; projection in a tight
      // JVM loop (planes × dims multiply-adds — no per-element lambda
      // evaluation on the hot path)
      val e0 = emb(s, dir)
      val bucketed = e0.select(col("vec_id"), col("v"), col("norm"))
        .as[(Long, Array[Double], Double)]
        .mapPartitions { it =>
          val coef = Array.tabulate(planes, 64) { (p, d) =>
            (graft.functions.MinHash.splitmix64(p * 1000003L + d) % 1000L).toDouble
          }
          it.map { case (id, arr, norm) =>
            var bucket = 0L
            var p = 0
            while (p < planes) {
              // per-term 2^-20 quantization (same trick as `cosine`):
              // integer-valued terms sum exactly, so the sign decision
              // is order-independent and a SQL oracle reproduces the
              // exact bucket assignment
              var dot = 0.0
              var d = 0
              while (d < 64) {
                dot += graft.functions.Num.round0(arr(d) * coef(p)(d) * Q)
                d += 1
              }
              if (dot > 0.0) bucket |= 1L << p
              p += 1
            }
            (id, arr, norm, bucket)
          }
        }
      val e = bucketed.toDF("vec_id", "v", "norm", "bucket")
      val q = e.filter(col("vec_id") < queryIds(s))
        .select(col("vec_id").as("query_id"), col("v").as("va"),
          col("norm").as("na"), col("bucket"))
      val c = e.select(col("vec_id").as("match_id"), col("v").as("vb"),
        col("norm").as("nb"), col("bucket"))
      val scored = c.join(broadcast(q), Seq("bucket"))
        .filter(col("match_id") =!= col("query_id"))
        .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
      rankTopK(scored, TopK)
    }
  }

  // Spark/DuckDB-parity rounding (graft.functions.Num): HALF_UP fast
  // path per term, decimal HALF_UP for the 6-digit score.
  private def r0(x: Double): Double = graft.functions.Num.round0(x)
  private def r6(x: Double): Double = graft.functions.Num.roundHalfUp(x, 6)

  /** Near-duplicate pairs ≥ `minSim` via banded hyperplane LSH: `bands`
    * bands of `r` sign bits (same splitmix-derived hyperplane family as
    * [[annLsh]]), candidates = pairs sharing ≥ 1 band value (emitted in
    * their first matching band, in-bucket generation grouped by full
    * signature with the [[graft.operators.LshBuckets]] cap — never a
    * bucket self-join), then EXACT quantized-cosine verification, so output
    * precision is always 1.0 and recall is the only approximation.
    *
    * Honest threshold math (and why the defaults are r=5, bands=102):
    * for a pair at cosine s the per-plane sign-flip probability is
    * arccos(s)/π — at the 0.4 threshold that is 0.369, leaving only a
    * 66°-vs-90° gap to random pairs, so banding must be sized for
    * RECALL, not pruning: per-pair miss (1-(1-0.369)^5)^102 ≈ 2e-5
    * (r=6/85 was first tried and measurably missed ~1 in 920 true
    * pairs at sf0.1 — caught by the full-scale oracle sweep; the
    * weaker bands fixed it, verified zero misses at both sf0.01 and
    * sf0.1, VecNeardupLshSpec pins recall == exact baseline). At this
    * threshold nearly all pruning comes from the signature-hamming
    * prefilter below, not the banding; banding's pruning power grows
    * steeply with the threshold (at s=0.8, r=16/bands=32 prunes
    * ~99.99%). At 0.4 the operator is bench-honest but only modestly
    * better than the all-pairs baseline — a property of the
    * threshold, not of the implementation. */
  def neardupLsh(s: SparkSession, dir: String, minSim: Double,
      r: Int, bands: Int): DataFrame = {
    import s.implicits._
    val planes = r * bands
    val e0 = emb(s, dir).select(col("vec_id"), col("v"), col("norm"))
    // per-vector band values in one JVM projection pass (planes × 64
    // quantized mul-adds; exact integer sums ⇒ deterministic signs).
    // Sole consumer is the bucket explode below (the hamming prefilter
    // runs inside the bucket loop on these same band values), so no
    // checkpoint is needed — the projection executes once per run.
    val banded = e0.as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val coef = Array.tabulate(planes, 64) { (p, d) =>
          (graft.functions.MinHash.splitmix64(p * 1000003L + d) % 1000L).toDouble
        }
        it.map { case (id, arr, _) =>
          val bvals = new Array[Long](bands)
          var p = 0
          while (p < planes) {
            var dot = 0.0
            var d = 0
            while (d < 64) {
              dot += graft.functions.Num.round0(arr(d) * coef(p)(d) * Q)
              d += 1
            }
            if (dot > 0.0) bvals(p / r) |= 1L << (p % r)
            p += 1
          }
          (id, bvals)
        }
      }
      .toDF("vec_id", "bvals")
    // sketch-hamming prefilter bound, applied INSIDE the bucket loop:
    // for a pair at cosine s the per-plane flip probability is
    // f = arccos(s)/π, so signature hamming is Binomial(planes, f) — a
    // one-sided 5σ bound at the threshold can only drop pairs whose
    // sketch says they are far below it (recall still pinned == exact
    // by the spec), while pruning most surviving random candidates
    // (mean planes/2) before any 64-dim row is materialized. At this
    // recall-sized banding nearly every pair shares a band, so emitting
    // the raw candidate set and re-joining signatures onto it would
    // materialize ~all-pairs rows just to throw 85%+ away — matchRep
    // already holds both members' band values (the sign signature,
    // r bits per long), so the hamming test runs right there and only
    // survivors ever become rows.
    val fFlip = math.acos(minSim) / math.Pi
    val hBound = math.ceil(planes * fFlip +
      5.0 * math.sqrt(planes * fFlip * (1 - fFlip))).toInt
    // first-matching-band in-bucket candidate generation (same shape as
    // the text LSH: identical signatures expand directly in band 0, the
    // pairwise loop runs per distinct signature, capped). Emission is a
    // lazy iterator (LshBuckets.pairs) — no executor-side pair buffer.
    val kCap = graft.operators.LshBuckets.maxBucketGroups(s)
    val prefiltered = banded
      .select(col("vec_id"), col("bvals"), posexplode(col("bvals")).as(Seq("band", "bv")))
      .as[(Long, Array[Long], Int, Long)]
      .groupByKey(t => (t._3, t._4))
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Long, Array[Long], Int, Long)]) =>
        val band = key._1
        val members = it.map(t => (t._1, t._2)).toArray.sortBy(_._1)
        graft.operators.LshBuckets.pairs[Array[Long], (Long, Long)](
          band, members,
          groupKey = scala.collection.immutable.ArraySeq.unsafeWrapArray(_),
          cap = kCap, tag = "vec LSH",
          matchRep = (sa, sb) => {
            var fb = 0
            while (sa(fb) != sb(fb)) fb += 1
            if (fb != band) None
            else {
              // hamming over the per-band sign bits: each long holds r
              // bits, so Σ popcount(xor) over bands ≡ hamming over the
              // packed planes-bit signature
              var ham = 0
              var i = 0
              while (i < sa.length && ham <= hBound) {
                ham += java.lang.Long.bitCount(sa(i) ^ sb(i)); i += 1
              }
              if (ham <= hBound) Some((ia, ib) => (ia, ib)) else None
            }
          },
          equalEmit = (ia, ib) => (ia, ib))
      }
      .toDF("ida", "idb")
    // exact verification: attach both vectors, quantized cosine in a
    // JVM kernel (bit-identical to the Column-expr `cosine` / the SQL
    // oracle), threshold filter. Array[Double] encoder: primitive
    // deserialization, no per-element boxing on the verify hot path.
    val va = e0.select(col("vec_id").as("ida"), col("v").as("va"), col("norm").as("na"))
    val vb = e0.select(col("vec_id").as("idb"), col("v").as("vb"), col("norm").as("nb"))
    prefiltered.join(va, "ida").join(vb, "idb")
      .select(col("ida"), col("idb"), col("va"), col("na"), col("vb"), col("nb"))
      .as[(Long, Long, Array[Double], Double, Array[Double], Double)]
      .mapPartitions(_.map { case (ida, idb, aa, na, bb, nb) =>
        var acc = 0.0
        var d = 0
        while (d < aa.length) { acc += r0(aa(d) * bb(d) * Q); d += 1 }
        (ida, idb, r6(acc / Q / (na * nb)))
      })
      .toDF("ida", "idb", "sim")
      .filter(col("sim") >= minSim)
  }

  /** IVF ANN. Scale path (100 TB): the coarse quantizer is small
    * relative to the corpus (1/step here; ~sqrt(N) trained centroids in
    * production — identical plumbing), so it is collected and broadcast;
    * list assignment is then a narrow per-partition JVM argmax — no
    * join, no shuffle of the corpus before the final per-query top-k —
    * and search touches only the nprobe/K fraction of the corpus
    * sharing a probed list. On a real deployment the assigned table is
    * written out partitioned by `cid`, so probing prunes partitions at
    * the source. The quantized arithmetic (per-term round(x·y·2^20),
    * exact integer sum, round to 6) is bit-identical to the Column-expr
    * cosine and the SQL oracle.
    */
  def annIvf(s: SparkSession, dir: String, centroidStep: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val cents: Array[(Long, Array[Double], Double)] =
      emb(s, dir).select(col("vec_id"), col("v"), col("norm"))
        .filter(col("vec_id") % centroidStep === 0)
        .as[(Long, Array[Double], Double)].collect()
        .sortBy(_._1)
    annIvfCore(s, dir, cents, nprobe, quantKey = s"step$centroidStep")
  }

  /** IVF with a TRAINED coarse quantizer: k-means centroids from
    * [[kmeansCentroids]] replace the id-step sample. k is EXACTLY the
    * sampled quantizer's list count (corpus-proportional, a count at
    * plan time — same tier as a12's bloom build), so against
    * `vec_ann_ivf` only centroid PLACEMENT differs: equal lists,
    * equal nprobe, and `vec_recall_eval_ivf` vs
    * `vec_recall_eval_trained` is a clean recall@k A/B of trained vs
    * sampled (sf0.01: 0.56 → 0.88 mean recall@10). Centroid norms use
    * the engine's lattice-rounded quadrature
    * (sqrt(Σ round(c²·2^20)/2^20)) so the SQL oracle's tcnorm is
    * bit-identical. */
  def annIvfTrained(s: SparkSession, dir: String, iters: Int,
      nprobe: Int): DataFrame =
    annIvfCore(s, dir, trainedCents(s, dir, iters), nprobe,
      quantKey = s"trained$iters")

  /** The gate-default trained-IVF list (the `vec_ann_ivf_trained`
    * tuning) — the dense side of [[SearchOps.hybridRrf]]. */
  private[graft] def annIvfTrainedDefault(s: SparkSession, dir: String): DataFrame =
    annIvfTrained(s, dir, KmeansIters, NProbe)

  /** Scalar quantization (FAISS ScalarQuantizer QT_8bit): each
    * dimension mapped to one byte on the corpus' per-dimension
    * [min, max] grid — 8× scan compression over float64 working
    * vectors (4× over the stored float32) with near-exact recall,
    * the cheap middle ground between full-precision flat scan and
    * PQ's 32×. Scoring is ASYMMETRIC (query full-precision vs decoded
    * codes), like the ADC convention of the PQ family.
    *
    * Determinism: min/max are exact order-independent aggregates;
    * encode `round((x-mn)/(mx-mn)·255)` and decode
    * `mn + code/255·(mx-mn)` are fixed sequences of correctly-rounded
    * IEEE ops, so both engines produce bit-identical decoded doubles,
    * and the scoring reuses the 2^-20-lattice quantized cosine
    * (per-product snap ⇒ exact order-independent sums). A constant
    * dimension (mx = mn) encodes 0 and decodes to mn in both engines.
    *
    * The per-dimension (mn, mx) table is 128 doubles collected at
    * plan time — the centroid planning tier. The flat code scan is
    * the SQ analogue of vec_topk_bruteforce (broadcast queries, one
    * narrow decode+score pass, bounded-heap top-k); for nprobe-pruned
    * scans compose with the IVF lists exactly as vec_ann_ivfpq does. */
  /** The per-dimension [min, max] grid as two array literals (plan
    * time, 128 doubles). */
  private def sq8Grid(e: DataFrame): (Column, Column) = {
    val mm = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("d").collect()
    (array(mm.map(r => lit(r.getDouble(1))).toIndexedSeq: _*),
      array(mm.map(r => lit(r.getDouble(2))).toIndexedSeq: _*))
  }

  private def sq8Encode(v: Column, mnC: Column, mxC: Column): Column =
    transform(v, (x, i) => {
      val mn = element_at(mnC, i + 1)
      val mx = element_at(mxC, i + 1)
      when(mx === mn, lit(0))
        .otherwise(round((x - mn) / (mx - mn) * lit(255.0)).cast("int"))
    })

  private def sq8Decode(codes: Column, mnC: Column, mxC: Column): Column =
    transform(codes, (c, i) => {
      val mn = element_at(mnC, i + 1)
      val mx = element_at(mxC, i + 1)
      mn + c.cast("double") / lit(255.0) * (mx - mn)
    })

  /** The decoded-SQ8 corpus table (match_id, vb, nb) — shared by the
    * flat scan and the IVF-composed scan. */
  private def sq8DecTable(s: SparkSession, dir: String): DataFrame =
    // the decoded-code corpus is the SQ8 index itself (encoded at
    // add-time; stored cid-partitioned at scale) — memoized so the
    // flat and IVF-composed scans share one grid collect + decode pass
    memoIndexTable(s, dir, "sq8dec") {
      val e = emb(s, dir)
      val (mnC, mxC) = sq8Grid(e)
      e.select(col("vec_id").as("match_id"),
          sq8Decode(sq8Encode(col("v"), mnC, mxC), mnC, mxC).as("vb"))
        .withColumn("nb", expr(
          s"sqrt(aggregate(vb, 0.0d, (a, x) -> a + round(x * x * ${Q}d)) / ${Q}d)"))
    }

  private[graft] def annSq8(s: SparkSession, dir: String): DataFrame = {
    val dec = sq8DecTable(s, dir)
    val q = queryBatchDF(s, dir)
    val scored = dec.join(broadcast(q))
      .filter(col("match_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
    rankTopK(scored, TopK)
  }

  /** The composed IVF × SQ8 index: trained coarse lists key the
    * 1-byte-per-dim code table, queries probe `nprobe` lists and
    * asymmetric-score only those candidates — the FAISS "IVF{k},SQ8"
    * factory string. Between IVF-PQ (8 bytes/vector, rerank needed)
    * and exact-scan IVF (512 bytes working set): 64 bytes/vector and
    * recall equal to the exact probed scan (SQ8's flat recall is 1.0
    * at sf0.01, so the probed-list loss — vec_recall_eval_trained's
    * 0.88 — is the ONLY loss; vec_recall_eval_ivfsq8 reads directly
    * against it). At scale the decode table is stored cid-partitioned
    * exactly like the PQ code table VecScaleProbe measures (1.8%
    * source scan at 200k vectors).
    *
    * List assignment is bit-identical to annIvfTrained's (same
    * centroidSims argmax, lowest cid on ties); decode/scoring are
    * [[annSq8]]'s. */
  private[graft] def annIvfSq8(s: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    import s.implicits._
    val cents = trainedCents(s, dir, KmeansIters)
    // list assignment from the shared memoized inverted lists (same
    // quantizer as annIvfTrained → same checkpoint)
    val assign = assignedTable(s, dir, s"trained$KmeansIters", cents)
      .select(col("vec_id").as("match_id"), col("cid"))
    // query probe lists on the driver — from the session query-batch
    // memo; same (−csim, cid) order as the SQL's probes CTE
    val probeSeq = queryBatch(s, dir).toSeq.flatMap { case (qid, v, norm) =>
      probeCids(v, norm, cents, nprobe).map(cid => (qid, cid))
    }
    val probePairs = probeSeq.toDF("query_id", "cid")
    val dec = sq8DecTable(s, dir)
    val q = queryBatchDF(s, dir)
    // plan-time literal probed-list set → source partition pruning on
    // the cid-partitioned artifact (see annIvfCore's note)
    val scored = assign.filter(col("cid").isin(probeSeq.map(_._2).distinct: _*))
      .join(broadcast(probePairs), Seq("cid"))
      .filter(col("match_id") =!= col("query_id"))
      .join(dec, Seq("match_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
    rankTopK(scored, TopK)
  }

  /** (vec_id, codes, decoded) — exposed for Sq8Spec's byte-range and
    * reconstruction-error pins. */
  private[graft] def sq8Table(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val (mnC, mxC) = sq8Grid(e)
    e.select(col("vec_id"), col("v"),
        sq8Encode(col("v"), mnC, mxC).as("codes"))
      .withColumn("decoded", sq8Decode(col("codes"), mnC, mxC))
  }

  /** The trained coarse quantizer with engine-lattice norms: k is
    * EXACTLY the sampled quantizer's list count (a count at plan
    * time — same tier as a12's bloom build), centroids from
    * [[kmeansCentroids]], norms via the lattice-rounded quadrature
    * (sqrt(Σ round(c²·2^20)/2^20)) so the SQL oracle's tcnorm is
    * bit-identical. Shared by [[annIvfTrained]] and [[annIvfPq]]. */
  /** Session-scoped memo: a trained coarse quantizer is an INDEX
    * ARTIFACT — train once, serve every query (the FAISS lifecycle).
    * Retraining the identical deterministic model per query call was
    * an artifact of the query-isolated harness, and five families
    * (trained-IVF, IVF-PQ, residual IVF-PQ, IVF-SQ8, the hybrid-RRF
    * dense leg) each paid the full Lloyd loop for the SAME centroids.
    * The model is k × (id, 64 doubles, norm) — driver-memory-trivial;
    * keying by session bounds the cache's lifetime. */
  private val centsMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), Array[(Long, Array[Double], Double)]]()

  private def trainedCents(s: SparkSession, dir: String,
      iters: Int): Array[(Long, Array[Double], Double)] = {
    // drop entries of stopped sessions — the shared purge rule
    graft.operators.Checkpoints.purgeStopped(centsMemo)(_._1)
    centsMemo.computeIfAbsent((s, dir, iters), { _ =>
      val k = emb(s, dir).filter(col("vec_id") % CentroidStep === 0).count().toInt
      kmeansCentroids(s, dir, k, iters).map { case (cid, arr) =>
        var acc = 0.0
        var d = 0
        while (d < arr.length) { acc += r0(arr(d) * arr(d) * Q); d += 1 }
        (cid, arr, math.sqrt(acc / Q))
      }
    })
  }

  /** Product-quantized ANN with asymmetric distance (ADC) — the
    * memory-bound half of an IVF-PQ index: the 64-dim float corpus
    * compresses to `m` code bytes per vector (a 32× reduction at
    * m=8), each code naming the vector's nearest per-subspace k-means
    * centroid. A query precomputes its squared distance to every
    * centroid of every subspace (an m×k table) and scores ANY code in
    * m table lookups — no float vector is touched at scan time, which
    * is what makes billion-vector search fit in memory (Jégou et al.
    * 2011). Exactness of the APPROXIMATION: subspace training reuses
    * the exact-lattice Lloyd loop, distances are Σ round((x−c)²·2^20)
    * integer-valued sums, so codes, tables and ADC scores are
    * bit-identical in both engines ⇒ full SQL oracle (m unrolled
    * per-subspace Lloyd chains + table joins).
    * Scale: codebooks are m×k×(64/m) doubles broadcast once; encoding
    * is one narrow pass; scoring is a narrow flatMap over codes with
    * the per-partition bounded-heap top-k. */
  def annPq(s: SparkSession, dir: String, m: Int, subK: Int, iters: Int): DataFrame =
    rankTopK(annPqScored(s, dir, m, subK, iters), TopK)
      .withColumn("adist", round(-col("sim"), 6))
      .select("query_id", "match_id", "adist", "rk")
      .orderBy("query_id", "rk")

  /** ADC shortlist + EXACT re-rank — the production IVF-PQ answer
    * path: the compressed scan ranks a `shortlist` of candidates per
    * query by approximate distance, then only those few vectors are
    * fetched and re-scored with the exact quantized cosine. Recall
    * recovers much of what 32× compression costs (sf0.01 recall@10:
    * 0.36 → 0.70, pinned in PqRerankSpec) while the exact math touches shortlist×queries
    * rows, not the corpus. */
  def annPqRerank(s: SparkSession, dir: String, m: Int, subK: Int,
      iters: Int, shortlist: Int): DataFrame = {
    val sl = rankTopK(annPqScored(s, dir, m, subK, iters), shortlist)
      .select("query_id", "match_id")
    exactRerank(s, dir, sl)
  }

  /** Exact-cosine re-rank of a small (query_id, match_id) shortlist:
    * the shortlist and the query batch both broadcast, so the only
    * corpus touch is one broadcast-hash-join probe fetching the
    * shortlisted vectors (at 100 TB: a point-lookup-shaped scan, never
    * a corpus pass). Shared tail of the flat-PQ and IVF-PQ answer
    * paths. */
  private def exactRerank(s: SparkSession, dir: String, sl: DataFrame): DataFrame = {
    val e = emb(s, dir)
    // the query vectors come from the session query-batch memo (a
    // local relation) — the old shape re-scanned the corpus, fanned 5
    // rows through an exchange and broadcast the result, per call
    val q = queryBatchDF(s, dir)
    val scored = e.select(col("vec_id").as("match_id"), col("v").as("vb"),
        col("norm").as("nb"))
      .join(broadcast(sl), "match_id")
      .join(broadcast(q), "query_id")
      .withColumn("sim", round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6))
    rankTopK(scored, TopK)
  }

  /** Session-scoped codebook memo, keyed by (session, dir, input tag,
    * m, subK, iters) — the [[trainedCents]] index-artifact doctrine
    * applied to PQ: the m Lloyd trainings are deterministic functions
    * of the corpus (and, for the residual tag, of the memoized coarse
    * quantizer), so per-query retraining repeated the identical model
    * build for every PQ family member in a session. */
  private val booksMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Int, Int, Int), Array[Array[(Long, Array[Double])]]]()

  private def memoBooks(s: SparkSession, dir: String, tag: String, m: Int,
      subK: Int, iters: Int)(train: => Array[Array[(Long, Array[Double])]])
      : Array[Array[(Long, Array[Double])]] = {
    // drop entries of stopped sessions — the shared purge rule
    graft.operators.Checkpoints.purgeStopped(booksMemo)(_._1)
    booksMemo.computeIfAbsent((s, dir, tag, m, subK, iters), _ => train)
  }

  /** Drop every memoized index model (coarse quantizer + PQ codebooks
    * + the query batch) of (session, dir) — the SearchOps.evictTfStage
    * sibling for the driver-array memos (ADVICE r15: session-keyed
    * caches needed an explicit eviction path for long-lived multi-dir
    * hosts). These hold no persisted blocks, so eviction is a plain
    * map removal; the next ANN call re-derives the identical
    * deterministic state. */
  def evictModels(s: SparkSession, dir: String): Unit = {
    centsMemo.keySet.removeIf(k => k._1 == s && k._2 == dir)
    booksMemo.keySet.removeIf(k => k._1 == s && k._2 == dir)
    queryBatchMemo.keySet.removeIf(k => k._1 == s && k._2 == dir)
  }

  /** Session memo of the ANN QUERY BATCH — the external-query stand-in
    * (`vec_id < queryBatch`) that every ANN row previously re-derived
    * from its own corpus scan + fan-out exchange + driver collect per
    * call (and the exact-rerank tail re-scanned AGAIN for the same 5
    * query vectors to broadcast-join them). (vec_id, v, norm) rows,
    * id-sorted — the [[centsMemo]] driver-array tier, batch × 64
    * doubles; keyed by (session, dir, batch size) so an ad-hoc
    * `spark.graft.ann.queryBatch` override keys its own entry. */
  private val queryBatchMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), Array[(Long, Array[Double], Double)]]()

  private def queryBatch(s: SparkSession, dir: String): Array[(Long, Array[Double], Double)] = {
    import s.implicits._
    graft.operators.Checkpoints.purgeStopped(queryBatchMemo)(_._1)
    queryBatchMemo.computeIfAbsent((s, dir, queryIds(s)), { _ =>
      emb(s, dir).select(col("vec_id"), col("v"), col("norm"))
        .filter(col("vec_id") < queryIds(s))
        .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    })
  }

  /** Driver-side 2^-20 lattice snap — [[graft.functions.Num.round0]]
    * is the engine replica of SQL round() (HALF_UP), so this is
    * bit-identical to snappedVecs' `transform(v, x -> round(x·2^20)/2^20)`
    * on the same doubles. */
  private def snapVec(v: Array[Double]): Array[Double] = {
    val out = new Array[Double](v.length)
    var d = 0
    while (d < v.length) { out(d) = r0(v(d) * Q) / Q; d += 1 }
    out
  }

  /** The query batch as a tiny local DataFrame (query_id, va, na) —
    * broadcast-join-ready with no corpus scan and no exchange. */
  private def queryBatchDF(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    queryBatch(s, dir).toSeq.toDF("query_id", "va", "na")
  }

  /** Per-subspace PQ codebooks: m independent exact-lattice Lloyd
    * trainings over the sliced (snapped) corpus — the compression
    * model is m×subK×(64/m) doubles, always a broadcast tier. */
  private def pqBooks(s: SparkSession, ds: Dataset[(Long, Array[Double])],
      m: Int, subK: Int, iters: Int): Array[Array[(Long, Array[Double])]] = {
    import s.implicits._
    val sub = 64 / m
    (0 until m).map { j =>
      kmeansLoop(s,
        ds.map { case (id, v) => (id, v.slice(j * sub, (j + 1) * sub)) }
          .toDF("vec_id", "vq").as[(Long, Array[Double])], // map loses column names
        subK, iters)
    }.toArray
  }

  /** Per-query ADC lookup tables in lattice units — the same round0
    * quadrature as `nearest`, so table entries equal the oracle's dq
    * sums. `qs` are the SNAPPED query vectors; the result is a
    * queries×m×subK table, broadcast to score any code in m lookups. */
  private def pqTables(qs: Array[(Long, Array[Double])],
      books: Array[Array[(Long, Array[Double])]]): Map[Long, Array[Map[Long, Double]]] = {
    val sub = books.head.head._2.length
    qs.map { case (qid, qv) =>
      qid -> books.indices.map { j =>
        val sv = qv.slice(j * sub, (j + 1) * sub)
        books(j).map { case (cid, cv) =>
          var acc = 0.0
          var d = 0
          while (d < sv.length) {
            val t = sv(d) - cv(d)
            acc += graft.functions.Num.round0(t * t * Q)
            d += 1
          }
          cid -> acc
        }.toMap
      }.toArray
    }.toMap
  }

  private def annPqScored(s: SparkSession, dir: String, m: Int, subK: Int,
      iters: Int): DataFrame = {
    import s.implicits._
    val ds = snappedVecs(s, dir)
    val books = memoBooks(s, dir, "pq", m, subK, iters)(pqBooks(s, ds, m, subK, iters))
    // the flat PQ code table is an index artifact (encoded at
    // add-time) — memoized like the codebooks it derives from
    val encoded = memoIndexTable(s, dir, s"pqcodes:$m:$subK:$iters") {
      val bcBooks = s.sparkContext.broadcast(books)
      ds.mapPartitions { it =>
        val bs = bcBooks.value
        val sb = bs.head.head._2.length
        it.map { case (id, v) =>
          val codes = new Array[Long](bs.length)
          var j = 0
          while (j < bs.length) {
            val (bi, _) = nearest(v.slice(j * sb, (j + 1) * sb), bs(j))
            codes(j) = bs(j)(bi)._1
            j += 1
          }
          (id, codes)
        }
      }.toDF("vec_id", "codes")
    }.as[(Long, Array[Long])]
    // snapped query vectors from the session query-batch memo (the
    // driver-side snap is bit-identical to snappedVecs' transform)
    val qs = queryBatch(s, dir).map { case (id, v, _) => (id, snapVec(v)) }
    val tables = pqTables(qs, books)
    val bcT = s.sparkContext.broadcast(tables)
    val scored = encoded.mapPartitions { it =>
      val ts = bcT.value
      it.flatMap { case (id, codes) =>
        ts.iterator.collect { case (qid, tabs) if qid != id =>
          var adq = 0.0
          var j = 0
          while (j < codes.length) { adq += tabs(j)(codes(j)); j += 1 }
          // negated so rankTopK's (sim desc, id asc) order = (adist
          // asc, id asc); adq/Q is exact (power-of-two divide)
          (qid, id, -(adq / Q))
        }
      }
    }.toDF("query_id", "match_id", "sim")
    scored
  }

  /** IVF-PQ — THE billion-vector index layout (Jégou et al. 2011,
    * FAISS `IVFx,PQy` with by_residual=false): the trained coarse
    * quantizer of [[annIvfTrained]] partitions the corpus into
    * inverted lists, each vector is stored as its `m` PQ code bytes
    * KEYED BY its list id, and a query (a) ranks the nprobe nearest
    * lists, (b) ADC-scores ONLY the codes in those lists via its
    * broadcast lookup tables, (c) exact-reranks the shortlist. The
    * compressed scan therefore touches nprobe/K of the corpus at
    * m bytes per vector — vs [[annPq]]'s flat scan of every code and
    * [[annIvf]]'s exact floats inside probed lists.
    *
    * Scale (100 TB / 10⁹ vectors): codebooks + coarse centroids +
    * per-query tables + probe sets are all broadcast tiers; encoding
    * is ONE narrow pass emitting (id, cid, codes); on a real
    * deployment the code table is written partitioned by `cid`, so
    * probing prunes partitions at the source and the scan reads
    * nprobe/K × m/256 of the float corpus' bytes. No shuffle anywhere
    * before the final ≤ k×queries×partitions ranking rows.
    *
    * Determinism: list assignment is [[annIvfTrained]]'s exact
    * arithmetic (rounded csim argmax, ties → lower cid), codes/tables
    * are [[annPq]]'s exact-lattice arithmetic ⇒ the full SQL oracle is
    * the two existing CTE chains composed (ivfcand ⋈ adc). */
  def annIvfPq(s: SparkSession, dir: String, m: Int, subK: Int, iters: Int,
      nprobe: Int, shortlist: Int): DataFrame = {
    val sl = rankTopK(annIvfPqScored(s, dir, m, subK, iters, nprobe), shortlist)
      .select("query_id", "match_id")
    exactRerank(s, dir, sl)
  }

  /** Residual-encoded IVF-PQ — FAISS's actual default
    * (`by_residual=true`): PQ codes quantize `v − centroid(list)`
    * instead of `v`, so the codebooks spend their bits on the
    * WITHIN-list structure the coarse quantizer already localized —
    * at equal code size the quantization error drops by roughly the
    * coarse cell's extent, which is what makes 8–16 byte codes usable
    * at billion scale. ADC becomes per-(query, probed-list): the
    * query's residual against each probed centroid gets its own
    * lookup table (nprobe × m × subK entries per query — still a
    * broadcast tier).
    *
    * Determinism: residuals are RE-SNAPPED to the 2^-20 lattice
    * (`round((vq−c)·2^20)/2^20`) — vq is lattice-exact and the
    * centroid coords are exact lattice-mean doubles, so the snapped
    * residual is bit-identical in both engines and the whole PQ
    * training/encoding/ADC machinery downstream stays exact ⇒ full
    * SQL oracle (the trained-IVF chain + residual-sliced Lloyd chains
    * + per-(query,list) table joins). */
  def annIvfPqRes(s: SparkSession, dir: String, m: Int, subK: Int,
      iters: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val sl = rankTopK(annIvfPqResScored(s, dir, m, subK, iters, nprobe), shortlist)
      .select("query_id", "match_id")
    exactRerank(s, dir, sl)
  }

  /** Snap `vq − cent` back onto the 2^-20 lattice (see [[annIvfPqRes]]
    * determinism note); SQL twin: `round((e.x − c.cx)·2^20)/2^20`. */
  private def snapRes(vq: Array[Double], cent: Array[Double]): Array[Double] = {
    val r = new Array[Double](vq.length)
    var d = 0
    while (d < vq.length) {
      r(d) = graft.functions.Num.round0((vq(d) - cent(d)) * Q) / Q
      d += 1
    }
    r
  }

  private def annIvfPqResScored(s: SparkSession, dir: String, m: Int,
      subK: Int, iters: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val cents = trainedCents(s, dir, KmeansIters)
    val centById = cents.map(c => c._1 -> c._2).toMap
    val bcCents = s.sparkContext.broadcast(cents)
    val e = emb(s, dir)
      .withColumn("vq", expr(s"transform(v, x -> round(x * ${Q}d) / ${Q}d)"))
      .select(col("vec_id"), col("v"), col("norm"), col("vq"))
    // ONE narrow pass: list assignment (annIvfTrained arithmetic) +
    // snapped residual; lazily checkpointed because BOTH the codebook
    // training (m sliced Lloyd loops) and the encoding pass read it
    val resDs = graft.operators.Checkpoints.truncate(
      e.as[(Long, Array[Double], Double, Array[Double])].mapPartitions { it =>
        val cs = bcCents.value
        it.map { case (id, v, norm, vq) =>
          val best = nearestCidIdx(centroidSims(v, norm, cs))
          (id, cs(best)._1, snapRes(vq, cs(best)._2))
        }
      }.toDF("vec_id", "cid", "res"))
    val books = memoBooks(s, dir, "pqres", m, subK, iters)(pqBooks(s,
      resDs.select(col("vec_id"), col("res")).as[(Long, Array[Double])],
      m, subK, iters))
    // residual code table — the same add-time index artifact tier
    val encoded = memoIndexTable(s, dir, s"ivfpqrescodes:$m:$subK:$iters") {
      val bcBooks = s.sparkContext.broadcast(books)
      resDs.as[(Long, Long, Array[Double])].mapPartitions { it =>
        val bs = bcBooks.value
        val sb = bs.head.head._2.length
        it.map { case (id, cid, res) =>
          val codes = new Array[Long](bs.length)
          var j = 0
          while (j < bs.length) {
            val (bi, _) = nearest(res.slice(j * sb, (j + 1) * sb), bs(j))
            codes(j) = bs(j)(bi)._1
            j += 1
          }
          (id, cid, codes)
        }
      }.toDF("vec_id", "cid", "codes")
    }.as[(Long, Long, Array[Long])]
    // per-(query, probed list) residual ADC tables — nprobe tables of
    // m × subK entries per query, driver-built (from the session
    // query-batch memo) and broadcast
    val qsRaw = queryBatch(s, dir)
    val probes: Map[Long, Seq[Long]] = qsRaw.map { case (qid, v, norm) =>
      qid -> probeCids(v, norm, cents, nprobe)
    }.toMap
    val qvq: Map[Long, Array[Double]] =
      qsRaw.map { case (qid, v, _) => qid -> snapVec(v) }.toMap
    // cid-indexed residual tables ([[tablesByList]]): per corpus row
    // the scorer touches only the queries probing THAT row's list
    val tables: Map[Long, Array[(Long, Array[Map[Long, Double]])]] =
      tablesByList(probes, (qid, cid) =>
        pqTables(Array((0L, snapRes(qvq(qid), centById(cid)))), books)(0L))
    val bcT = s.sparkContext.broadcast(tables)
    val noQ = Array.empty[(Long, Array[Map[Long, Double]])]
    encoded.mapPartitions { it =>
      val ts = bcT.value
      it.flatMap { case (id, cid, codes) =>
        ts.getOrElse(cid, noQ).iterator.collect {
          case (qid, tabs) if qid != id =>
            var adq = 0.0
            var j = 0
            while (j < codes.length) { adq += tabs(j)(codes(j)); j += 1 }
            (qid, id, -(adq / Q))
        }
      }
    }.toDF("query_id", "match_id", "sim")
  }

  private def annIvfPqScored(s: SparkSession, dir: String, m: Int,
      subK: Int, iters: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val ds = snappedVecs(s, dir)
    val books = memoBooks(s, dir, "pq", m, subK, iters)(pqBooks(s, ds, m, subK, iters))
    val cents = trainedCents(s, dir, KmeansIters)
    // ONE narrow pass over the corpus emitting (id, list, codes): the
    // list id from the raw-double csim argmax (identical to
    // annIvfTrained's assignment), the codes from the snapped-lattice
    // nearest-subcentroid encoding (identical to annPq's) — the `vq`
    // column carries the SAME SQL snap expression as snappedVecs so
    // both arithmetics see exactly their oracle's operands.
    val e = emb(s, dir)
      .withColumn("vq", expr(s"transform(v, x -> round(x * ${Q}d) / ${Q}d)"))
      .select(col("vec_id"), col("v"), col("norm"), col("vq"))
    // (id, list, codes) is THE IVF-PQ index layout (the scaladoc's
    // "written partitioned by cid" table) — encoded once per session;
    // the codebook/centroid broadcasts live INSIDE the build closure so
    // a memo-hit call ships no dead broadcasts (ADVICE r21)
    val encoded = memoIndexTable(s, dir, s"ivfpqcodes:$m:$subK:$iters") {
      val bcBooks = s.sparkContext.broadcast(books)
      val bcCents = s.sparkContext.broadcast(cents)
      e.as[(Long, Array[Double], Double, Array[Double])]
        .mapPartitions { it =>
          val cs = bcCents.value
          val bs = bcBooks.value
          val sb = bs.head.head._2.length
          it.map { case (id, v, norm, vq) =>
            val best = nearestCidIdx(centroidSims(v, norm, cs))
            val codes = new Array[Long](bs.length)
            var j = 0
            while (j < bs.length) {
              val (bi, _) = nearest(vq.slice(j * sb, (j + 1) * sb), bs(j))
              codes(j) = bs(j)(bi)._1
              j += 1
            }
            (id, cs(best)._1, codes)
          }
        }.toDF("vec_id", "cid", "codes")
    }.as[(Long, Long, Array[Long])]
    // the query batch is small by definition: probe lists ranked on
    // the driver (same (−csim, cid) order as annIvfCore) and ADC
    // tables from the snapped query vectors — both from the session
    // query-batch memo, no per-call corpus scan
    val qsRaw = queryBatch(s, dir)
    val probes: Map[Long, Seq[Long]] = qsRaw.map { case (qid, v, norm) =>
      qid -> probeCids(v, norm, cents, nprobe)
    }.toMap
    val qsSnap = qsRaw.map { case (id, v, _) => (id, snapVec(v)) }
    val tables = pqTables(qsSnap, books)
    // cid-indexed ([[tablesByList]]): the non-residual tables are
    // per-query only, shared by reference across that query's lists
    val byList: Map[Long, Array[(Long, Array[Map[Long, Double]])]] =
      tablesByList(probes, (qid, _) => tables(qid))
    val bcT = s.sparkContext.broadcast(byList)
    val noQ = Array.empty[(Long, Array[Map[Long, Double]])]
    encoded.mapPartitions { it =>
      val ts = bcT.value
      it.flatMap { case (id, cid, codes) =>
        ts.getOrElse(cid, noQ).iterator.collect {
          case (qid, tabs) if qid != id =>
            var adq = 0.0
            var j = 0
            while (j < codes.length) { adq += tabs(j)(codes(j)); j += 1 }
            (qid, id, -(adq / Q))
        }
      }
    }.toDF("query_id", "match_id", "sim")
  }

  /** Nearest-list argmax over [[centroidSims]] output — ties fall to
    * the LOWER cid (cents are cid-sorted, comparison strict). The ONE
    * tie-break every IVF family member must share; a divergent copy
    * breaks engine/oracle parity for exactly one query family
    * (review r14 pass 2). Returns the index into `cs`. */
  private def nearestCidIdx(sims: Array[Double]): Int = {
    var best = 0
    var ci = 1
    while (ci < sims.length) { if (sims(ci) > sims(best)) best = ci; ci += 1 }
    best
  }

  /** A query's nprobe probe lists in (−csim, cid) order — the shared
    * driver-side ranking (the SQL `probes` CTE's crk order). */
  private def probeCids(v: Array[Double], norm: Double,
      cents: Array[(Long, Array[Double], Double)], nprobe: Int): Seq[Long] = {
    val sims = centroidSims(v, norm, cents)
    cents.indices.sortBy(i => (-sims(i), cents(i)._1)).take(nprobe)
      .map(cents(_)._1).toSeq
  }

  /** Index the broadcast per-query ADC state BY LIST ID: probe pairs
    * (qid → its nprobe cids) invert to cid → the queries probing that
    * list, each carrying its table from `table(qid, cid)`. The probed
    * scorers look up `byList(cid)` per corpus row, so per-row work is
    * O(queries actually probing that row's list) — NOT O(total query
    * batch), which a flat map scan per row degenerates to the moment
    * the batch grows past the demo 5 (a 10k-query recall eval paid
    * 10k tuple checks per row — VERDICT r14 #1). Total broadcast size
    * is unchanged: Σ|probes| entries either way. */
  private[graft] def tablesByList[T](probes: Map[Long, Seq[Long]],
      table: (Long, Long) => T): Map[Long, Array[(Long, T)]] =
    probes.toSeq
      .flatMap { case (qid, cids) => cids.map(cid => cid -> (qid, table(qid, cid))) }
      .groupBy(_._1)
      .map { case (cid, xs) => cid -> xs.map(_._2).sortBy(_._1).toArray }

  /** Rounded csim of one vector to every coarse centroid — shared by
    * the distributed list-assignment argmax and the driver-side probe
    * ranking, in both the exact-IVF and IVF-PQ paths. */
  private def centroidSims(arr: Array[Double], norm: Double,
      cs: Array[(Long, Array[Double], Double)]): Array[Double] = {
    val sims = new Array[Double](cs.length)
    var ci = 0
    while (ci < cs.length) {
      val cv = cs(ci)._2
      var acc = 0.0
      var d = 0
      while (d < arr.length) { acc += r0(arr(d) * cv(d) * Q); d += 1 }
      sims(ci) = r6(acc / Q / (norm * cs(ci)._3))
      ci += 1
    }
    sims
  }

  /** Session memo of the ASSIGNED inverted-list table
    * (vec_id, v, norm, cid) — the IVF index's inverted lists
    * THEMSELVES, i.e. the index artifact a production deployment
    * writes out partitioned by `cid` and serves every query from (the
    * [[annIvf]] scaladoc's own doctrine; FAISS assigns once at
    * add-time, never per search). Within one session every
    * trained-IVF consumer — the fixed/filtered/adaptive rows, the
    * recall evals, the hybrid dense leg, IVF-SQ8 — previously re-ran
    * the identical corpus-wide assignment pass (plus its scan and
    * fan-out exchange) per query call; now the first builds a pinned
    * eager checkpoint ([[GraphOps]] edgeMemo discipline: pin before
    * materialize, shared staleness probe, purge on stopped sessions)
    * and the rest read it. Keyed by a quantizer tag (`trained<iters>`
    * / `step<step>`) so assignments of distinct quantizers coexist;
    * entries are corpus×(64 doubles + cid) — the same memory tier as
    * [[SearchOps.tfStage]]'s doc×term checkpoint. */
  private val indexTableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Generic session memo of a pinned eager-checkpoint INDEX TABLE —
    * the [[GraphOps]] edgeMemo discipline (pin before materialize,
    * shared staleness probe, purge on stopped sessions) keyed by an
    * artifact tag. Serves the inverted-list assignment above plus the
    * PQ / residual-PQ code tables and the SQ8 decoded corpus — all
    * FAISS add-time artifacts a deployment encodes once and serves
    * every query from.
    *
    * With [[IndexDirConf]] set the same tables are served from an
    * ON-DISK artifact instead (see [[artifactTable]]): that is the
    * 100 TB deployment shape — nothing corpus-sized stays pinned in
    * executor memory, and cid-partitioned consumers prune at the
    * source. The session memo is the default and the fallback. */
  private def memoIndexTable(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    s.conf.getOption(IndexDirConf).map(_.trim).filter(_.nonEmpty)
        .flatMap(root => localCorpus(s, dir).map((root, _))) match {
      // the artifact tier is gated on a LOCALLY fingerprintable corpus
      // (resolved through Hadoop's own rules — see localCorpus): a
      // corpus the fingerprint walk cannot see would fold to a constant
      // and a re-ingested corpus would silently keep serving the stale
      // artifact — fall back to the session memo instead (review r22)
      case Some((root, src)) =>
        artifactTable(s, root, dir, tag, src)(build)
      case None =>
        graft.operators.Checkpoints.purgeStopped(indexTableMemo)(_._1)
        indexTableMemo.computeIfPresent((s, dir, tag), { (_, e) =>
          if (!graft.operators.Checkpoints.stale(e)) e
          else { graft.operators.Checkpoints.unpinAndUnpersist(e); null }
        })
        indexTableMemo.computeIfAbsent((s, dir, tag), { _ =>
          val df = graft.operators.Checkpoints.pinCheckpointed(
            graft.operators.Checkpoints.truncate(build))
          graft.operators.Checkpoints.buildPinned(df) {
            df.count()
            df
          }
        })
    }

  /** Opt-in on-disk index-artifact root (VERDICT r21 task 1). When
    * `spark.graft.index.dir` names a directory, every index table is
    * WRITTEN ONCE as parquet under `<root>/<corpus>/<tag>/<fp>/` —
    * partitioned by `cid` when the table carries one, so probed
    * consumers prune list partitions at the source (guide §6) — and
    * served by plain reads: executor memory no longer holds a pinned
    * corpus replica per quantizer key. `<fp>` is the source corpus
    * fingerprint (embeddings.parquet file names+lengths+mtimes —
    * Spark's own file-index freshness contract): a changed corpus
    * keys a fresh artifact and the stale sibling is removed at build.
    * [[evictIndexTables]] deletes the corpus' artifacts.
    *
    * Concurrency contract: ONE writer JVM per index root. The build
    * lock serializes first consumers within a JVM; two driver JVMs
    * sharing a root could interleave the overwrite-write of the same
    * artifact path. Deployments that share a root across drivers must
    * pre-build the artifacts (one warm-up run) or coordinate
    * externally; the fallback on any inconsistency is simply to unset
    * the conf — the session memo needs no coordination.
    *
    * The directory naming scheme (lossy-mapped tail + FNV-1a path
    * hash) is part of the root's on-disk format: changing it orphans
    * artifacts written under an older scheme (neither the
    * stale-sibling sweep nor evict can find them) — clear the root
    * when upgrading across a scheme change. */
  val IndexDirConf = "spark.graft.index.dir"

  /** Resolve `<dir>/embeddings.parquet` through Hadoop's OWN path
    * resolution — the same defaultFS/working-directory rules the
    * corpus read uses — and return the local file iff it lives on the
    * local filesystem and exists. Bare `java.io.File` would disagree
    * with Spark's view exactly when it matters (review r22 pass 2): a
    * RELATIVE path under a remote defaultFS could resolve to an
    * unrelated local checkout (fingerprinting the wrong files — the
    * stale-artifact bug again), and a local corpus addressed as
    * `file:///` would flunk the gate and silently lose the artifact
    * tier. */
  private def localCorpus(s: SparkSession, dir: String): Option[java.io.File] =
    try {
      val p = new org.apache.hadoop.fs.Path(dir, "embeddings.parquet")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.getScheme != "file") None
      else Some(new java.io.File(
        p.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri.getPath))
        .filter(_.exists())
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Filesystem-safe directory name for a corpus dir / artifact tag.
    * The lossy character map alone can collide (`/a/b_c` vs `/a_b/c`),
    * and a collision would make the stale-sibling cleanup and
    * [[evictIndexTables]] delete the OTHER corpus' artifacts — so the
    * raw string's FNV-1a hash is appended, and since the hash carries
    * uniqueness the readable prefix keeps only the path's distinctive
    * TAIL, capping the component well under the 255-byte filename
    * limit that a deep corpus path would otherwise hit (review r22). */
  private def sanitize(p: String): String = {
    var h = 0xcbf29ce484222325L
    p.foreach { c => h ^= c; h *= 0x100000001b3L }
    val mapped = p.map(c => if (c.isLetterOrDigit) c else '_')
    (if (mapped.length > 100) mapped.takeRight(100) else mapped) +
      "-" + java.lang.Long.toHexString(h)
  }

  /** Fingerprint of the artifact's SOURCE data: every file under the
    * resolved local `embeddings.parquet` folded as
    * (name, length, mtime). */
  private def sourceFingerprint(src: java.io.File): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
          .foldLeft(f.getName.hashCode.toLong)((acc, c) => acc * 31L + walk(c))
      else (f.getName.hashCode.toLong * 31L + f.length()) * 31L + f.lastModified()
    walk(src)
  }

  // one build lock per artifact path: concurrent first consumers of the
  // same (root, dir, tag, fp) write exactly once
  private val artifactLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def artifactTable(s: SparkSession, root: String, dir: String,
      tag: String, src: java.io.File)(build: => DataFrame): DataFrame = {
    val base = new java.io.File(new java.io.File(root, sanitize(dir)), sanitize(tag))
    val fp = java.lang.Long.toHexString(sourceFingerprint(src))
    val out = new java.io.File(base, fp)
    // schema sidecar: partitionBy moves `cid` to the END of the read
    // schema and partition-column type inference can narrow it — the
    // builder's DDL restores order and types so artifact-served frames
    // are shape-identical to memo-served ones (positional .as[tuple]
    // consumers). Written LAST, so it doubles as the success marker.
    val ddlFile = new java.io.File(out, "_graft_schema_ddl")
    val lock = artifactLocks.computeIfAbsent(out.getPath, _ => new Object)
    lock.synchronized {
      if (!ddlFile.exists()) {
        // a changed corpus keys a new fp — remove stale siblings so a
        // long-lived root does not accumulate dead corpus-sized dirs
        Option(base.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName != fp)
          .foreach(deleteRecursively)
        val df = build
        val w = df.write.mode("overwrite")
        (if (df.columns.contains("cid")) w.partitionBy("cid") else w)
          .parquet(out.getPath)
        java.nio.file.Files.writeString(ddlFile.toPath, df.schema.toDDL)
      }
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      java.nio.file.Files.readString(ddlFile.toPath))
    s.read.parquet(out.getPath)
      .select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  private def assignedTable(s: SparkSession, dir: String, quantKey: String,
      cents: Array[(Long, Array[Double], Double)]): DataFrame = {
    import s.implicits._
    memoIndexTable(s, dir, s"assigned:$quantKey") {
      val bc = s.sparkContext.broadcast(cents)
      // one narrow pass over the corpus: nearest list per vector
      // (ties → lower cid, since cents is id-sorted and comparison is
      // strict)
      emb(s, dir).select(col("vec_id"), col("v"), col("norm"))
        .as[(Long, Array[Double], Double)].mapPartitions { it =>
          val cs = bc.value
          it.map { case (id, v, norm) =>
            (id, v, norm, cs(nearestCidIdx(centroidSims(v, norm, cs)))._1)
          }
        }.toDF("vec_id", "v", "norm", "cid")
    }
  }

  /** Drop the memoized index tables of (session, dir) — the
    * evictGraphEdges sibling. With [[IndexDirConf]] set, also deletes
    * the corpus' on-disk artifacts under the session's root (the next
    * consumer rebuilds from source). */
  def evictIndexTables(s: SparkSession, dir: String): Unit = {
    val it = indexTableMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == s && e.getKey._2 == dir) {
        it.remove()
        graft.operators.Checkpoints.unpinAndUnpersist(e.getValue)
      }
    }
    s.conf.getOption(IndexDirConf).filter(_.trim.nonEmpty).foreach { root =>
      deleteRecursively(new java.io.File(root.trim, sanitize(dir)))
    }
  }

  private def annIvfCore(s: SparkSession, dir: String,
      cents: Array[(Long, Array[Double], Double)], nprobe: Int,
      quantKey: String,
      keepMatches: DataFrame => DataFrame = identity): DataFrame = {
    import s.implicits._

    // the session-memoized inverted lists (index artifact — assigned
    // once per quantizer, served to every IVF consumer)
    val assigned = assignedTable(s, dir, quantKey, cents)

    // the query batch is small by definition (external queries) —
    // rank its probe lists on the driver from the session query-batch
    // memo: no per-call pass over the assigned table for 5 rows
    val probePairs = queryBatch(s, dir)
      .flatMap { case (id, v, norm) =>
        probeCids(v, norm, cents, nprobe).map(cid => (id, v, norm, cid))
      }.toSeq
    val probes = probePairs.toDF("query_id", "va", "na", "cid")
    // the probed list ids are a PLAN-TIME literal set (the probe
    // ranking is driver-side), so the corpus side carries an explicit
    // cid IN (...) — on the cid-partitioned artifact ([[IndexDirConf]])
    // that is source partition PRUNING (guide §6), replacing a scan of
    // every list; semantics unchanged (the equi-join keeps only those
    // cids anyway). On the memo path it is a cheap checkpoint filter.
    val probedCids = probePairs.map(_._4).distinct
    // exact scoring inside the probed lists only; the metadata filter
    // (filtered-ANN family) prunes candidates BEFORE the scoring join
    val scored = keepMatches(assigned)
      .filter(col("cid").isin(probedCids: _*))
      .join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("va"), col("v"), col("na"), col("norm")), 6))
      .withColumnRenamed("vec_id", "match_id")
    rankTopK(scored, TopK)
  }

  private val dotSql =
    """sum(round(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) *
               CAST(b.embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0"""

  /** Brute-force top-k SQL with an optional extra match-side
    * predicate — `""` is the unfiltered truth, the filtered-ANN twin
    * passes the label predicate (round 18). */
  private def bruteforceSqlWith(matchPred: String): String =
    s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          dots AS (
            SELECT a.vec_id AS query_id, b.vec_id AS match_id, $dotSql AS dot
            FROM embeddings a JOIN embeddings b ON a.vec_id < $QueryIdsDefault
                 AND b.vec_id <> a.vec_id$matchPred
            CROSS JOIN idx
            GROUP BY 1, 2),
          scored AS (
            SELECT query_id, match_id,
                   round(dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots
            JOIN norms na ON na.vec_id = query_id
            JOIN norms nb ON nb.vec_id = match_id),
          ranked AS (
            SELECT query_id, match_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, match_id ASC) AS rk
            FROM scored)
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK ORDER BY query_id, rk"""

  private val bruteforceSql = bruteforceSqlWith("")
  private val bruteforceFilteredSql =
    bruteforceSqlWith("\n                 AND b.label % 2 = 0")

  // SQL twin of annLsh(planes=8): splitmix64-derived hyperplane
  // coefficients (signed % 1000, matching the JVM's Long % — DuckDB
  // % also follows the dividend sign), 2^-20-quantized projections
  // (exact integer sums ⇒ order-independent sign), bucket equi-join,
  // then the standard quantized-cosine top-k skeleton.
  private val annLshSql: String = {
    import OracleSql._
    val coefBase =
      "SELECT p.p, d.d FROM (SELECT unnest(range(0,8)) AS p) p, (SELECT unnest(range(0,64)) AS d) d"
    val coefNested = nest(coefBase, splitmixSteps("CAST(p * 1000003 + d AS HUGEINT)", "sm"))
    s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
          coef AS (
            SELECT p, d, CAST(${sb("sm")} % 1000 AS DOUBLE) AS w FROM ($coefNested)),
          proj AS (
            SELECT e.vec_id, c.p,
                   sum(round(CAST(e.embedding[CAST(c.d AS INT) + 1] AS DOUBLE) * c.w * 1048576)) AS dot
            FROM embeddings e CROSS JOIN coef c GROUP BY 1, 2),
          buckets AS (
            SELECT vec_id,
                   CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY vec_id),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          cand AS (
            SELECT q.vec_id AS query_id, b.vec_id AS match_id
            FROM buckets q JOIN buckets b ON q.bucket = b.bucket
            WHERE q.vec_id < $QueryIdsDefault AND b.vec_id <> q.vec_id),
          dots AS (
            SELECT c.query_id, c.match_id, $dotSql AS dot
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.query_id
            JOIN embeddings b ON b.vec_id = c.match_id
            CROSS JOIN idx
            GROUP BY 1, 2),
          scored AS (
            SELECT query_id, match_id, round(dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots
            JOIN norms na ON na.vec_id = query_id
            JOIN norms nb ON nb.vec_id = match_id),
          ranked AS (
            SELECT query_id, match_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, match_id ASC) AS rk
            FROM scored)
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK ORDER BY query_id, rk"""
  }

  private val annIvfSql: String =
    s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
                    WHERE vec_id % $CentroidStep = 0),
          cdots AS (
            SELECT v.vec_id, c.cid,
                   sum(round(CAST(v.embedding[CAST(i AS INT)] AS DOUBLE) *
                             CAST(c.cemb[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0 AS dot
            FROM embeddings v CROSS JOIN cents c CROSS JOIN idx
            GROUP BY 1, 2),
          csims AS (
            SELECT cd.vec_id, cd.cid, round(cd.dot / (nv.nrm * nc.nrm), 6) AS csim
            FROM cdots cd
            JOIN norms nv ON nv.vec_id = cd.vec_id
            JOIN norms nc ON nc.vec_id = cd.cid),
          assigned AS (
            SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid ASC) AS crk
              FROM csims) t WHERE crk = 1),
          probes AS (
            SELECT vec_id AS query_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid ASC) AS crk
              FROM csims WHERE vec_id < $QueryIdsDefault) t WHERE crk <= $NProbe),
          cand AS (
            SELECT p.query_id, a.vec_id AS match_id
            FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id),
          dots AS (
            SELECT c.query_id, c.match_id, $dotSql AS dot
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.query_id
            JOIN embeddings b ON b.vec_id = c.match_id
            CROSS JOIN idx
            GROUP BY 1, 2),
          scored AS (
            SELECT query_id, match_id, round(dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots
            JOIN norms na ON na.vec_id = query_id
            JOIN norms nb ON nb.vec_id = match_id),
          ranked AS (
            SELECT query_id, match_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, match_id ASC) AS rk
            FROM scored)
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK ORDER BY query_id, rk"""

  // SQL twin of annIvfTrained: the unrolled-Lloyd CTE chain up to the
  // final centroid update c{iters-1} (exactly what kmeansAssign
  // assigns against), then the identical IVF skeleton with the
  // trained centroids as the coarse quantizer. Centroid norms use the
  // same lattice-rounded quadrature as the engine.
  /** The trained-IVF chain up through the per-vector list assignment
    * (`assigned`) and query list ranking (`csims`) — everything that
    * does NOT depend on the probe width. Leaves `idx`, `norms`,
    * `csims`, `assigned` in scope. Split out of the cand prefix in
    * round 20 so the adaptive dispatch twin can interpose its decision
    * CTEs between the assignment and the (now width-parameterized)
    * probe set. */
  private val ivfTrainedAssignPrefix: String = {
    val last = s"c${KmeansIters - 1}"
    s"""${kmeansCtes(TrainedKSql, KmeansIters - 1)},
          idx AS (SELECT unnest(range(1, 65)) AS i),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          tcnorm AS (
            SELECT cid, sqrt(sum(round(cx * cx * 1048576)) / 1048576.0) AS nrm
            FROM $last GROUP BY cid),
          cdots AS (
            SELECT v.vec_id, t.cid,
                   sum(round(CAST(v.embedding[CAST(t.pos AS INT)] AS DOUBLE) *
                             t.cx * 1048576)) / 1048576.0 AS dot
            FROM embeddings v CROSS JOIN $last t
            GROUP BY 1, 2),
          csims AS (
            SELECT cd.vec_id, cd.cid, round(cd.dot / (nv.nrm * nc.nrm), 6) AS csim
            FROM cdots cd
            JOIN norms nv ON nv.vec_id = cd.vec_id
            JOIN tcnorm nc ON nc.cid = cd.cid),
          assigned AS (
            SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid ASC) AS crk
              FROM csims) t WHERE crk = 1)"""
  }

  /** Probe set + candidate set over [[ivfTrainedAssignPrefix]]'s
    * `csims`/`assigned`, with the probe width as a SQL expression —
    * the fixed-nprobe oracles pass the literal, the adaptive twin a
    * scalar subquery on its decision CTE. */
  private def ivfProbesCandCtes(nprobeSql: String): String =
    s"""probes AS (
            SELECT vec_id AS query_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid ASC) AS crk
              FROM csims WHERE vec_id < $QueryIdsDefault) t WHERE crk <= $nprobeSql),
          cand AS (
            SELECT p.query_id, a.vec_id AS match_id
            FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id)"""

  /** The trained-IVF chain up through the probed-list candidate set
    * `cand` (query_id, match_id) — shared by the exact-scan trained
    * IVF oracle and the composed IVF-SQ8 oracle. Leaves `idx`,
    * `norms`, `cand` in scope. */
  private val ivfTrainedCandPrefix: String =
    s"""$ivfTrainedAssignPrefix,
          ${ivfProbesCandCtes(NProbe.toString)}"""

  /** Exact-scoring tail over candidate table `candTable` as CTEs named
    * `${p}dots` / `${p}scored` / `${p}ranked` — the standard quantized
    * cosine + per-query ranking, shared by [[annIvfScoredSql]] (p="")
    * and both branches of the adaptive dispatch twin (the brute-force
    * branch takes p="bf" so the two chains coexist in one WITH).
    * Expects `idx` and `norms` in scope. */
  private def scoredTailCtes(candTable: String, p: String): String =
    s"""${p}dots AS (
            SELECT c.query_id, c.match_id, $dotSql AS dot
            FROM $candTable c
            JOIN embeddings a ON a.vec_id = c.query_id
            JOIN embeddings b ON b.vec_id = c.match_id
            CROSS JOIN idx
            GROUP BY 1, 2),
          ${p}scored AS (
            SELECT query_id, match_id, round(dot / (na.nrm * nb.nrm), 6) AS sim
            FROM ${p}dots
            JOIN norms na ON na.vec_id = query_id
            JOIN norms nb ON nb.vec_id = match_id),
          ${p}ranked AS (
            SELECT query_id, match_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, match_id ASC) AS rk
            FROM ${p}scored)"""

  /** The exact-scoring tail of a trained-IVF oracle over candidate
    * table `candTable`, with `extraCtes` (e.g. the filtered-ANN label
    * join) appended to the shared prefix — one skeleton, unfiltered
    * and filtered twins (round 18). */
  private def annIvfScoredSql(extraCtes: String, candTable: String): String =
    s"""WITH $ivfTrainedCandPrefix$extraCtes,
          ${scoredTailCtes(candTable, "")}
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK ORDER BY query_id, rk"""

  private val annIvfTrainedSql: String = annIvfScoredSql("", "cand")
  private val annIvfFilteredSql: String = annIvfScoredSql(
    """,
          candf AS (
            SELECT c.query_id, c.match_id FROM cand c
            JOIN embeddings l ON l.vec_id = c.match_id AND l.label % 2 = 0)""",
    "candf")

  /** Gate predicates for the ADAPTIVE filtered rows (VERDICT r19
    * task 2) — deterministic id-derived stand-ins for a shard/source
    * metadata filter, chosen so each row exercises ONE dispatch branch
    * at every committed scale factor (FilteredAnnSpec pins the branch;
    * the oracle below twins the dispatch itself, so parity holds even
    * at corpus shapes where the branch flips):
    *  - moderate, ~22% (`vec_id % 9 < 2`): expected qualifying
    *    candidates per probed list ≈ 6.6-6.9, so the probe WIDENS from
    *    the base 4 to 5 lists (Some(5) at sf0.001/0.01/0.1);
    *  - sparse, 4% (`vec_id % 25 = 24`): at 500 vectors the qualifying
    *    corpus (20) cannot confidently fill k=10 (None — exact
    *    filtered brute force); at sf0.1's 2000 vectors the required
    *    probe width (25 lists) exceeds 30% of the 65 lists (None — the
    *    index would scan most of itself and still risk recall). */
  private val AdaptiveModeratePred: Column = col("vec_id") % 9 < 2
  private val AdaptiveSparsePred: Column = col("vec_id") % 25 === 24
  private def adaptiveModerateSqlPred(a: String): String = s"$a.vec_id % 9 < 2"
  private def adaptiveSparseSqlPred(a: String): String = s"$a.vec_id % 25 = 24"

  /** SQL twin of [[annIvfFilteredAdaptive]] INCLUDING the dispatch
    * (VERDICT r19 task 2): the decision arithmetic of
    * [[adaptiveNprobe]] runs in SQL over the same corpus statistics —
    * keep/total from the predicate, `nl` = SURVIVING trained-list
    * count (DISTINCT cid of the final Lloyd update, matching
    * `trainedCents().length` — empty clusters vanish in both engines)
    * — and the final SELECT takes the widened-probe IVF branch or the
    * filtered brute-force branch per the 1-row `adec` verdict, so the
    * oracle follows the engine's branch at ANY corpus shape. The
    * floating-point forms mirror the Scala composition exactly:
    * perList = (keep/total)·(total/nl) — NOT keep/nl, whose different
    * rounding could flip a ceil boundary — and the probe width caps
    * compare through the same max/ceil/min sequence. */
  private def annAdaptiveSql(predFor: String => String): String = {
    val last = s"c${KmeansIters - 1}"
    val perList = "((s.keep / s.total) * (s.total / s.nl))"
    val need = s"($AdaptiveSafety * $TopK)"
    val pRaw = s"GREATEST($NProbe, CAST(ceil($need / $perList) AS INT))"
    s"""WITH $ivfTrainedAssignPrefix,
          astats AS (
            SELECT CAST(count(*) FILTER (WHERE ${predFor("embeddings")}) AS DOUBLE) AS keep,
                   CAST(count(*) AS DOUBLE) AS total,
                   CAST((SELECT count(DISTINCT cid) FROM $last) AS DOUBLE) AS nl
            FROM embeddings),
          adec AS (
            SELECT CASE
                     WHEN s.total = 0 OR s.keep <= 0
                          OR $perList * s.nl < $need THEN 0
                     WHEN CAST($pRaw AS DOUBLE)
                          > GREATEST(CAST($NProbe AS DOUBLE),
                                     $AdaptiveMaxProbeFrac * s.nl) THEN 0
                     ELSE 1 END AS use_ivf,
                   CASE WHEN s.total = 0 OR s.keep <= 0 THEN 0
                        ELSE LEAST(CAST(s.nl AS INT), $pRaw) END AS p
            FROM astats s),
          ${ivfProbesCandCtes("(SELECT p FROM adec)")},
          candf AS (
            SELECT c.query_id, c.match_id FROM cand c
            JOIN embeddings l ON l.vec_id = c.match_id AND ${predFor("l")}),
          ${scoredTailCtes("candf", "")},
          bfcand AS (
            SELECT a.vec_id AS query_id, b.vec_id AS match_id
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < $QueryIdsDefault AND b.vec_id <> a.vec_id
                 AND ${predFor("b")}),
          ${scoredTailCtes("bfcand", "bf")}
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK AND 1 = (SELECT use_ivf FROM adec)
          UNION ALL
          SELECT query_id, match_id, sim, rk FROM bfranked
          WHERE rk <= $TopK AND 0 = (SELECT use_ivf FROM adec)
          ORDER BY query_id, rk"""
  }

  /** SQL twin of [[annIvfSq8]]: the trained-IVF candidate prefix
    * composed with the SQ8 decode chain — asymmetric decoded cosine
    * over the probed lists only (`norms` doubles as the query-norm
    * table; per-dim grid/decode identical to annSq8Sql's). */
  private val annIvfSq8Sql: String =
    s"""WITH $ivfTrainedCandPrefix,
          mm AS (
            SELECT i, min(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mn,
                   max(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mx
            FROM embeddings, idx GROUP BY i),
          dec AS (
            SELECT e.vec_id, m.i,
                   m.mn + (CASE WHEN m.mx = m.mn THEN 0
                           ELSE CAST(round((CAST(e.embedding[CAST(m.i AS INT)] AS DOUBLE) - m.mn)
                                           / (m.mx - m.mn) * 255) AS INT) END)
                         / 255.0 * (m.mx - m.mn) AS dv
            FROM embeddings e, mm m),
          dnorm AS (
            SELECT vec_id, sqrt(sum(round(dv * dv * 1048576)) / 1048576.0) AS nrm
            FROM dec GROUP BY vec_id),
          sdots AS (
            SELECT c.query_id, c.match_id,
                   sum(round(CAST(q.embedding[CAST(d.i AS INT)] AS DOUBLE) * d.dv * 1048576)) / 1048576.0 AS dot
            FROM cand c
            JOIN embeddings q ON q.vec_id = c.query_id
            JOIN dec d ON d.vec_id = c.match_id
            GROUP BY 1, 2),
          scored AS (
            SELECT query_id, match_id, round(dot / (na.nrm * dn.nrm), 6) AS sim
            FROM sdots
            JOIN norms na ON na.vec_id = query_id
            JOIN dnorm dn ON dn.vec_id = match_id),
          ranked AS (
            SELECT query_id, match_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, match_id ASC) AS rk
            FROM scored)
          SELECT query_id, match_id, sim, rk FROM ranked
          WHERE rk <= $TopK ORDER BY query_id, rk"""

  // SQL twin of annPq: per-subspace (pos-sliced epos) unrolled Lloyd
  // chains; codes = the final assignment a{j}_{iters}; query tables =
  // exact lattice quadrature against c{j}_{iters-1}; ADC = m-way code
  // join + m-way table join summing exact integer-valued dq terms.
  // `includeEpos=false` lets a composing query (annIvfPqSql) define
  // the shared snap table once; `candJoin` restricts the ADC scan to
  // a candidate CTE — the SQL twin of the nprobe list pruning.
  private def annPqChain(includeEpos: Boolean, candJoin: String): String = {
    val perSub = (0 until PqM).map { j =>
      val lo = j * (64 / PqM) + 1
      val hi = (j + 1) * (64 / PqM)
      val e = s"e$j"
      val its = (1 to PqIters).map { i =>
        s"""d${j}_$i AS MATERIALIZED (SELECT e.vec_id, c.cid,
                SUM(round((e.x - c.cx) * (e.x - c.cx) * 1048576.0)) AS dq
              FROM $e e JOIN c${j}_${i - 1} c ON e.pos = c.pos
              GROUP BY e.vec_id, c.cid),
            a${j}_$i AS MATERIALIZED (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dq, cid) AS rn
                FROM d${j}_$i) t WHERE rn = 1),
            c${j}_$i AS MATERIALIZED (SELECT a.cid, e.pos, SUM(e.x) / COUNT(*) AS cx
              FROM a${j}_$i a JOIN $e e ON a.vec_id = e.vec_id
              GROUP BY a.cid, e.pos)"""
      }.mkString(",\n")
      s"""$e AS MATERIALIZED (SELECT vec_id, pos, x FROM epos WHERE pos BETWEEN $lo AND $hi),
          c${j}_0 AS MATERIALIZED (SELECT vec_id AS cid, pos, x AS cx FROM $e WHERE vec_id < $PqK),
          $its,
          qt$j AS MATERIALIZED (SELECT q.vec_id AS qid, c.cid,
                SUM(round((q.x - c.cx) * (q.x - c.cx) * 1048576.0)) AS dq
              FROM $e q JOIN c${j}_${PqIters - 1} c ON q.pos = c.pos
              WHERE q.vec_id < $QueryIdsDefault GROUP BY 1, 2)"""
    }.mkString(",\n")
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN a${j}_$PqIters v$j ON v$j.vec_id = v0.vec_id").mkString("\n")
    val tabJoins = (0 until PqM).map { j =>
      val qidCond = if (j == 0) "" else s" AND q$j.qid = q0.qid"
      s"JOIN qt$j q$j ON q$j.cid = v$j.cid$qidCond"
    }.mkString("\n")
    val adq = (0 until PqM).map(j => s"q$j.dq").mkString(" + ")
    val eposCte = if (includeEpos)
      """epos AS MATERIALIZED (
          SELECT vec_id, CAST(g.pos AS INT) AS pos,
                 round(CAST(embedding[CAST(g.pos AS INT)] AS DOUBLE) * 1048576.0) / 1048576.0 AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) g),
        """
    else ""
    s"""$eposCte$perSub,
        adc AS MATERIALIZED (
          SELECT q0.qid AS query_id, v0.vec_id AS match_id, $adq AS adq
          FROM a0_$PqIters v0
          $codeJoins
          $tabJoins
          $candJoin
          WHERE v0.vec_id <> q0.qid),
        pqranked AS MATERIALIZED (
          SELECT query_id, match_id, adq,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adq, match_id) AS rk
          FROM adc)"""
  }

  private val annPqChainSql: String =
    annPqChain(includeEpos = true, candJoin = "")

  private val annPqSql: String =
    s"""WITH $annPqChainSql
        SELECT query_id, match_id, round(adq / 1048576.0, 6) AS adist, rk
        FROM pqranked WHERE rk <= $TopK ORDER BY query_id, rk"""

  // SQL twin of annPqRerank: the ADC shortlist (rk <= 50) re-scored
  // with the exact quantized cosine, then the final top-k
  // Shared exact-rerank tail over a `cand(query_id, match_id)` CTE —
  // ONE definition of rdots/rescored/rr so the flat-PQ, IVF-PQ and
  // residual-IVF-PQ oracles cannot drift apart (review r13); callers
  // must have `idx` and `norms` CTEs in scope.
  private val rerankTailCtes: String =
    s"""rdots AS (
          SELECT c.query_id, c.match_id, $dotSql AS dot
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.query_id
          JOIN embeddings b ON b.vec_id = c.match_id
          CROSS JOIN idx
          GROUP BY 1, 2),
        rescored AS (
          SELECT query_id, match_id, round(dot / (na.nrm * nb.nrm), 6) AS sim
          FROM rdots
          JOIN norms na ON na.vec_id = query_id
          JOIN norms nb ON nb.vec_id = match_id),
        rr AS (
          SELECT query_id, match_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, match_id ASC) AS rk
          FROM rescored)"""

  private val rerankSelect: String =
    s"""SELECT query_id, match_id, sim, rk FROM rr
        WHERE rk <= $TopK ORDER BY query_id, rk"""

  private val idxNormsCtes: String =
    s"""idx AS (SELECT unnest(range(1, 65)) AS i),
        norms AS MATERIALIZED (
          SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                        CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
          FROM embeddings, idx GROUP BY vec_id)"""

  // SQL twin of annPqRerank: the ADC shortlist (rk <= 50) re-scored
  // with the exact quantized cosine, then the final top-k
  private val annPqRerankSql: String =
    s"""WITH $annPqChainSql,
        cand AS (SELECT query_id, match_id FROM pqranked WHERE rk <= $PqShortlist),
        $idxNormsCtes,
        $rerankTailCtes
        $rerankSelect"""

  /** Shared trained-IVF skeleton: tcnorm/cdots/csims/assigned/probes/
    * ivfcand over the coarse chain's LAST centroid table — one
    * definition feeding both the raw and residual IVF-PQ oracles
    * (review r13: two hand-synced copies of this block is exactly the
    * parity drift kmeansCtes' byte-equivalence warning exists for).
    * assigned/probes/ivfcand are MATERIALIZED: the residual chain
    * reads assigned twice (rres + radc) and probes twice
    * (ivfcand + qres). Expects `epos`, `idx`, `norms` in scope. */
  private def ivfSkeletonCtes(last: String): String =
    s"""tcnorm AS (
          SELECT cid, sqrt(sum(round(cx * cx * 1048576)) / 1048576.0) AS nrm
          FROM $last GROUP BY cid),
        cdots AS (
          SELECT v.vec_id, t.cid,
                 sum(round(CAST(v.embedding[CAST(t.pos AS INT)] AS DOUBLE) *
                           t.cx * 1048576)) / 1048576.0 AS dot
          FROM embeddings v CROSS JOIN $last t
          GROUP BY 1, 2),
        csims AS MATERIALIZED (
          SELECT cd.vec_id, cd.cid, round(cd.dot / (nv.nrm * nc.nrm), 6) AS csim
          FROM cdots cd
          JOIN norms nv ON nv.vec_id = cd.vec_id
          JOIN tcnorm nc ON nc.cid = cd.cid),
        assigned AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid ASC) AS crk
            FROM csims) t WHERE crk = 1),
        probes AS MATERIALIZED (
          SELECT vec_id AS query_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid ASC) AS crk
            FROM csims WHERE vec_id < $QueryIdsDefault) t WHERE crk <= $NProbe),
        ivfcand AS MATERIALIZED (
          SELECT p.query_id, a.vec_id AS match_id
          FROM probes p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id)"""

  private val eposCteM: String =
    """epos AS MATERIALIZED (
          SELECT vec_id, CAST(g.pos AS INT) AS pos,
                 round(CAST(embedding[CAST(g.pos AS INT)] AS DOUBLE) * 1048576.0) / 1048576.0 AS x
          FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) g)"""

  // SQL twin of annIvfPq — the two existing chains COMPOSED: the
  // shared epos snap table, the trained-quantizer Lloyd chain + IVF
  // skeleton, the probed-list candidate set `ivfcand`, the PQ chain
  // with its ADC scan restricted to ivfcand, then the shared
  // shortlist + exact re-rank tail.
  private val annIvfPqSql: String = {
    val last = s"c${KmeansIters - 1}"
    s"""WITH $eposCteM,
        ${kmeansCtes(TrainedKSql, KmeansIters - 1, includeEpos = false)},
        $idxNormsCtes,
        ${ivfSkeletonCtes(last)},
        ${annPqChain(includeEpos = false,
          candJoin = "JOIN ivfcand fc ON fc.query_id = q0.qid AND fc.match_id = v0.vec_id")},
        cand AS (SELECT query_id, match_id FROM pqranked WHERE rk <= $PqShortlist),
        $rerankTailCtes
        $rerankSelect"""
  }

  // SQL twin of annIvfPqRes: the shared trained-IVF skeleton, snapped
  // per-vector residuals `rres` against the assigned centroid,
  // residual-sliced Lloyd chains (names r-prefixed), query residuals
  // PER PROBED LIST (`qres`), per-(query, list, codeword) ADC tables
  // `rqt{j}`, the ADC join keyed by the CANDIDATE's assigned list —
  // then the shared shortlist + exact re-rank tail.
  private val annIvfPqResSql: String = {
    val last = s"c${KmeansIters - 1}"
    val sub = 64 / PqM
    val perSub = (0 until PqM).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      val e = s"re$j"
      val its = (1 to PqIters).map { i =>
        s"""rd${j}_$i AS MATERIALIZED (SELECT e.vec_id, c.cid,
                SUM(round((e.x - c.cx) * (e.x - c.cx) * 1048576.0)) AS dq
              FROM $e e JOIN rc${j}_${i - 1} c ON e.pos = c.pos
              GROUP BY e.vec_id, c.cid),
            ra${j}_$i AS MATERIALIZED (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dq, cid) AS rn
                FROM rd${j}_$i) t WHERE rn = 1),
            rc${j}_$i AS MATERIALIZED (SELECT a.cid, e.pos, SUM(e.x) / COUNT(*) AS cx
              FROM ra${j}_$i a JOIN $e e ON a.vec_id = e.vec_id
              GROUP BY a.cid, e.pos)"""
      }.mkString(",\n")
      s"""$e AS MATERIALIZED (SELECT vec_id, pos, x FROM rres WHERE pos BETWEEN $lo AND $hi),
          rc${j}_0 AS MATERIALIZED (SELECT vec_id AS cid, pos, x AS cx FROM $e WHERE vec_id < $PqK),
          $its,
          rqt$j AS MATERIALIZED (SELECT q.query_id, q.cid, b.cid AS bcid,
                SUM(round((q.x - b.cx) * (q.x - b.cx) * 1048576.0)) AS dq
              FROM qres q JOIN rc${j}_${PqIters - 1} b ON q.pos = b.pos
              GROUP BY 1, 2, 3)"""
    }.mkString(",\n")
    val codeJoins = (1 until PqM)
      .map(j => s"JOIN ra${j}_$PqIters v$j ON v$j.vec_id = v0.vec_id").mkString("\n")
    val tabJoins = (0 until PqM).map { j =>
      s"JOIN rqt$j t$j ON t$j.query_id = fc.query_id AND t$j.cid = av.cid AND t$j.bcid = v$j.cid"
    }.mkString("\n")
    val adq = (0 until PqM).map(j => s"t$j.dq").mkString(" + ")
    s"""WITH $eposCteM,
        ${kmeansCtes(TrainedKSql, KmeansIters - 1, includeEpos = false)},
        $idxNormsCtes,
        ${ivfSkeletonCtes(last)},
        rres AS MATERIALIZED (
          SELECT e.vec_id, e.pos,
                 round((e.x - c.cx) * 1048576.0) / 1048576.0 AS x
          FROM epos e
          JOIN assigned a ON a.vec_id = e.vec_id
          JOIN $last c ON c.cid = a.cid AND c.pos = e.pos),
        qres AS MATERIALIZED (
          SELECT p.query_id, p.cid, e.pos,
                 round((e.x - c.cx) * 1048576.0) / 1048576.0 AS x
          FROM probes p
          JOIN epos e ON e.vec_id = p.query_id
          JOIN $last c ON c.cid = p.cid AND c.pos = e.pos),
        $perSub,
        radc AS MATERIALIZED (
          SELECT fc.query_id, v0.vec_id AS match_id, $adq AS adq
          FROM ra0_$PqIters v0
          $codeJoins
          JOIN assigned av ON av.vec_id = v0.vec_id
          JOIN ivfcand fc ON fc.match_id = v0.vec_id
          $tabJoins),
        rranked AS MATERIALIZED (
          SELECT query_id, match_id, adq,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adq, match_id) AS rk
          FROM radc),
        cand AS (SELECT query_id, match_id FROM rranked WHERE rk <= $PqShortlist),
        $rerankTailCtes
        $rerankSelect"""
  }


  /** SQL twin of [[annSq8]]: per-dim min/max, encode/decode as the
    * identical correctly-rounded op sequence, decoded-norm quadrature
    * and quantized asymmetric cosine on the standard skeleton. */
  private val annSq8Sql =
    s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
        mm AS (
          SELECT i, min(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mn,
                 max(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS mx
          FROM embeddings, idx GROUP BY i),
        dec AS (
          SELECT e.vec_id, m.i,
                 m.mn + (CASE WHEN m.mx = m.mn THEN 0
                         ELSE CAST(round((CAST(e.embedding[CAST(m.i AS INT)] AS DOUBLE) - m.mn)
                                         / (m.mx - m.mn) * 255) AS INT) END)
                       / 255.0 * (m.mx - m.mn) AS dv
          FROM embeddings e, mm m),
        dnorm AS (
          SELECT vec_id, sqrt(sum(round(dv * dv * 1048576)) / 1048576.0) AS nrm
          FROM dec GROUP BY vec_id),
        qnorm AS (
          SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                        CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
          FROM embeddings, idx WHERE vec_id < $QueryIdsDefault GROUP BY vec_id),
        dots AS (
          SELECT q.vec_id AS query_id, d.vec_id AS match_id,
                 sum(round(CAST(q.embedding[CAST(d.i AS INT)] AS DOUBLE) * d.dv * 1048576)) / 1048576.0 AS dot
          FROM embeddings q JOIN dec d ON q.vec_id < $QueryIdsDefault AND d.vec_id <> q.vec_id
          GROUP BY 1, 2),
        scored AS (
          SELECT query_id, match_id, round(dot / (qn.nrm * dn.nrm), 6) AS sim
          FROM dots
          JOIN qnorm qn ON qn.vec_id = query_id
          JOIN dnorm dn ON dn.vec_id = match_id),
        ranked AS (
          SELECT query_id, match_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, match_id ASC) AS rk
          FROM scored)
        SELECT query_id, match_id, sim, rk FROM ranked
        WHERE rk <= $TopK ORDER BY query_id, rk"""

  def oracle: Map[String, String] = Map(
    "vec_ann_ivfsq8" -> annIvfSq8Sql,
    "vec_recall_eval_ivfsq8" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annIvfSq8Sql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_ann_sq8" -> annSq8Sql,
    "vec_recall_eval_sq8" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annSq8Sql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_ann_pq" -> annPqSql,
    "vec_ann_pq_rerank" -> annPqRerankSql,
    "vec_ann_ivfpq" -> annIvfPqSql,
    "vec_ann_ivfpq_res" -> annIvfPqResSql,
    "vec_recall_eval_ivfpq_res" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annIvfPqResSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_recall_eval_ivfpq" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annIvfPqSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_topk_bruteforce" -> bruteforceSql,
    // recall@k: both sides are the full oracles above nested as
    // subqueries (DuckDB allows WITH inside a derived table)
    "vec_recall_eval" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annLshSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_recall_eval_ivf" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annIvfSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_recall_eval_trained" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceSql) t
          LEFT JOIN ($annIvfTrainedSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_ann_ivf" -> annIvfSql,
    "vec_ann_ivf_trained" -> annIvfTrainedSql,
    "vec_ann_ivf_filtered" -> annIvfFilteredSql,
    // the adaptive rows' oracles REPLICATE THE DISPATCH (see
    // annAdaptiveSql): decision arithmetic in SQL, widened-probe IVF
    // branch and filtered-brute-force branch both present, the 1-row
    // verdict picking which one emits
    "vec_ann_adaptive" -> annAdaptiveSql(adaptiveModerateSqlPred),
    "vec_ann_adaptive_sparse" -> annAdaptiveSql(adaptiveSparseSqlPred),
    "vec_recall_eval_adaptive" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM (${bruteforceSqlWith("\n                 AND " + adaptiveModerateSqlPred("b"))}) t
          LEFT JOIN (${annAdaptiveSql(adaptiveModerateSqlPred)}) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_recall_eval_filtered" ->
      s"""SELECT t.query_id,
                 round(CAST(count(a.match_id) AS DOUBLE) / $TopK, 6) AS recall_at_k
          FROM ($bruteforceFilteredSql) t
          LEFT JOIN ($annIvfFilteredSql) a
            ON a.query_id = t.query_id AND a.match_id = t.match_id
          GROUP BY t.query_id ORDER BY t.query_id""",
    "vec_ann_lsh" -> annLshSql,
    // the LSH sibling's oracle IS the exact all-pairs result: the
    // banded candidates are verified with the identical quantized
    // cosine, so precision is 1.0 by construction, and recall == 1.0 on
    // this corpus is pinned by VecNeardupLshSpec (parameters chosen so
    // the worst true pair still shares a band, see neardupLsh scaladoc)
    "vec_neardup_lsh" -> neardupPairsSql,
    "vec_neardup_pairs" -> neardupPairsSql,

    // Lloyd unrolled: epos grid-snaps coordinates exactly as the JVM
    // kernel; d_i/a_i/c_i per iteration (distances are exact integer
    // sums on the 2^-20 lattice, means divide exact sums — bit-equal
    // to Spark); final assignment is a_iters
    "vec_kmeans" ->
      s"""WITH ${kmeansCtes(KmeansK.toString, KmeansIters)}
          SELECT vec_id, cid AS cluster, round(dq / 1048576.0, 6) AS dist
          FROM a$KmeansIters ORDER BY vec_id""",

    "vec_semdedup" ->
      s"""WITH ${kmeansCtes(KmeansK.toString, KmeansIters)},
          idx AS (SELECT unnest(range(1, 65)) AS i),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          dropped AS (
            SELECT y_id AS vec_id FROM (
              SELECT x.vec_id AS x_id, y.vec_id AS y_id,
                     round(($dotSql) / (na.nrm * nb.nrm), 6) AS sim
              FROM a$KmeansIters x
              JOIN a$KmeansIters y ON x.cid = y.cid AND x.vec_id < y.vec_id
              JOIN embeddings a ON a.vec_id = x.vec_id
              JOIN embeddings b ON b.vec_id = y.vec_id
              JOIN norms na ON na.vec_id = x.vec_id
              JOIN norms nb ON nb.vec_id = y.vec_id
              CROSS JOIN idx
              GROUP BY x.vec_id, y.vec_id, na.nrm, nb.nrm) p
            WHERE sim >= $SemDedupThreshold GROUP BY y_id)
          SELECT f.vec_id, f.cid AS cluster, (d.vec_id IS NULL) AS kept
          FROM a$KmeansIters f LEFT JOIN dropped d ON d.vec_id = f.vec_id
          ORDER BY f.vec_id"""
  )

  /** Unrolled Lloyd CTE chain shared by the kmeans/semdedup oracles:
    * `epos` (grid-snapped per-dim table), seed centroids `c0`, then
    * (d_i distances, a_i argmin assignment, c_i mean update) per
    * iteration — the exact SQL twin of [[kmeansAssign]]. */
  private def kmeansCtes(k: String, iters: Int,
      includeEpos: Boolean = true): String = {
    // a composing query (annIvfPqSql) defines the shared epos snap
    // table once; the definition here must stay byte-equivalent
    val eposCte = if (includeEpos)
      """epos AS (
            SELECT vec_id, CAST(g.pos AS INT) AS pos,
                   round(CAST(embedding[CAST(g.pos AS INT)] AS DOUBLE) * 1048576.0) / 1048576.0 AS x
            FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) g),
          """
    else ""
    val head =
      s"""${eposCte}c0 AS (SELECT vec_id AS cid, pos, x AS cx FROM epos WHERE vec_id < $k)"""
    val its = (1 to iters).map { i =>
      s"""d$i AS (SELECT e.vec_id, c.cid,
                    SUM(round((e.x - c.cx) * (e.x - c.cx) * 1048576.0)) AS dq
                  FROM epos e JOIN c${i - 1} c ON e.pos = c.pos
                  GROUP BY e.vec_id, c.cid),
          a$i AS (SELECT vec_id, cid, dq FROM (
                    SELECT vec_id, cid, dq,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY dq, cid) AS rn
                    FROM d$i) t WHERE rn = 1),
          c$i AS (SELECT a.cid, e.pos, SUM(e.x) / COUNT(*) AS cx
                  FROM a$i a JOIN epos e ON a.vec_id = e.vec_id
                  GROUP BY a.cid, e.pos)"""
    }
    (head +: its).mkString(",\n")
  }

  private val neardupPairsSql =
    s"""WITH idx AS (SELECT unnest(range(1, 65)) AS i),
          norms AS (
            SELECT vec_id, sqrt(sum(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
                                          CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)) / 1048576.0) AS nrm
            FROM embeddings, idx GROUP BY vec_id),
          dots AS (
            SELECT a.vec_id AS ida, b.vec_id AS idb, $dotSql AS dot
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            CROSS JOIN idx
            GROUP BY 1, 2),
          scored AS (
            SELECT ida, idb, round(dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots
            JOIN norms na ON na.vec_id = ida
            JOIN norms nb ON nb.vec_id = idb)
          SELECT ida, idb, sim FROM scored WHERE sim >= 0.4 ORDER BY ida, idb"""
}
