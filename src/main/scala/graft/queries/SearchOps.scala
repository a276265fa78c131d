package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval over the document corpus — the sparse/lexical complement
  * to VectorOps' dense ANN stack, plus the fusion that makes the two
  * a production retrieval pipeline (RAG data curation, dedup-aware
  * sampling, eval-set mining):
  *
  *  - `text_chunk`: sliding-window chunking (size 32, stride 24
  *    tokens) — the narrow flatMap that fans documents out into the
  *    retrieval/embedding units every RAG pipeline starts from.
  *  - `search_bm25_topk`: BM25 top-k retrieval through the
  *    inverted-index plan shape (posting lists = `tf` grouped by
  *    term; the query-term table and the vocabulary-sized `df` table
  *    ride as broadcasts; candidates are generated per posting-list
  *    entry, never per (query × doc)).
  *  - `search_hybrid_rrf`: Reciprocal Rank Fusion of the BM25 ranks
  *    with the trained-IVF dense ANN ranks — score = Σ 1/(60+rank),
  *    the standard hybrid-search combiner.
  *
  * Determinism doctrine (the ln-free BM25 variant): classic BM25's
  * `ln((N-df+0.5)/(df+0.5) + 1)` is the ONE sub-expression whose
  * value is not IEEE-defined (libm vs Math.log may differ at 1 ulp),
  * so the oracled scoring uses the exact-rational idf
  * `(N+1)/(df+0.5) = (2N+2)/(2df+1)` — the log's argument itself,
  * skipping the log. Monotone in df like the classic weight, and the
  * per-term score factors into TWO double ratios:
  *
  *   term = [(2N+2)/(2df+1)] · [44·tf·S / (20·tf·S + 6·S + 18·dl·N)]
  *
  * (idf × tf-saturation; k1 = 6/5, b = 3/4, avgdl = S/N multiplied
  * through; N docs, S total tokens, dl doc length). Every product is
  * computed IN DOUBLE with a parenthesized, left-associated op
  * sequence written identically in both engines — overflow-safe at
  * ANY corpus scale (the largest intermediate, 20·tf·S, is ~1e26 at
  * 100 TB: far inside double range, where the single-BIGINT form
  * 88·(N+1)·tf·S would silently wrap int64 past N·S ≈ 1e17
  * — ADVICE r14). Determinism survives the move off exact integers:
  * ×, +, /, and int→double conversion are each correctly rounded and
  * IEEE-defined, so a fixed op tree on identical integer inputs is
  * bit-identical across engines (the RRF argument); only
  * REASSOCIATION is forbidden, hence the explicit parentheses. The
  * quotient is snapped to the 2^-20 lattice so the per-(query,doc)
  * SUM is order-independent — the vec_kmeans doctrine applied to
  * retrieval.
  * The log-idf variant is pinned separately in SearchOpsSpec (same
  * top-k on the fixture corpus; rank-equivalence is per-term, not
  * global, so the spec asserts the fixture outcome, not an identity).
  *
  * Scale (100 TB): tokenize/tf/dl are one shuffle each on (doc, term)
  * / doc; `df` and the query-term table are vocabulary- and
  * query-batch-sized broadcasts; per-query top-k goes through
  * [[VectorOps.rankTopK]]'s per-partition bounded heap, so the final
  * ranking window sees ≤ k × nQueries × numPartitions rows — no
  * corpus-sized per-query funnel. RRF fuses two already-top-k lists
  * (≤ 2k rows per query by construction). Corpus scalars (N, S) are
  * two longs collected at plan time — the a12-bloom bounded planning
  * tier; folding them in as literals keeps the per-term arithmetic
  * codegen'd and avoids the constant-key-join
  * BroadcastNestedLoopJoin trap (PlanLint-forbidden).
  */
object SearchOps extends Serializable {

  private val ChunkSize = 32
  private val ChunkStride = 24
  /** Query docs: doc_id < 5 — aligned with VectorOps' `vec_id < 5`
    * query batch so the hybrid fusion joins the two stacks on the
    * same query ids (documents and embeddings share the id domain). */
  private val NQueries = 5
  private val TopK = 10
  /** RRF smoothing constant (Cormack et al. 2009's k=60). */
  private val RrfK = 60

  /** Corpus scan — the BARE reader (the [[TextOps.docs]] doctrine):
    * the direct consumers (chunking, positional postings) are cheap
    * per-doc kernels that a wholesale fan-out exchange made 1.4–2×
    * slower in the fresh-JVM `spark.graft.fanout` A/B. The one heavy
    * stage — the tokenize→tf build of [[tfStage]], paid once per
    * session — fans out its own input below, and its checkpoint keeps
    * that partitioning for every downstream retrieval consumer. */
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** (doc_id, term) token stream — `split(_, " ", -1)` keeps trailing
    * empties like DuckDB's string_split (the Scala-split trap). Fanned
    * out (guide §2.5): sole consumer is the session-memoized tf build,
    * where the exchange is paid once and the parallel tokenize+tf
    * amortizes over every retrieval row. */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    graft.operators.FanOut(docs(s, dir)).select(col("doc_id"),
      explode(split(col("text"), " ", -1)).as("term"))

  /** Session-scoped memo of the SHARED retrieval stage: the truncated
    * (doc_id, term, tf) table plus the two corpus scalars (N docs,
    * S tokens). Every sparse-retrieval consumer — `search_bm25_topk`,
    * `text_keyword_topk`, and `search_hybrid_rrf`'s sparse leg — reads
    * the same tokenize→tf computation, so within one session the
    * corpus is tokenized ONCE and later rows pay only their own
    * scoring (VERDICT r14 #3: hybrid recomputed the full tf/dl/df
    * pipeline its sibling row had just built). The checkpoint is
    * vocabulary×doc-bounded (distinct (doc, term) pairs); keying by
    * the session keeps entries from leaking across restarted
    * sessions, and the reliable-checkpoint conf applies as everywhere
    * else. N is the count of docs with ≥ 1 token row — identical to
    * `text IS NOT NULL` (empty text still splits to one empty token)
    * — and S is Σ tf, both derived from the checkpoint itself. */
  private val tfMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, Long, Long)]()

  private[graft] def tfStage(s: SparkSession, dir: String): (DataFrame, Long, Long) = {
    // purge entries pinned to STOPPED sessions on every access —
    // without this the map strongly holds dead sessions (and their
    // checkpointed DataFrames) for the JVM's lifetime in a
    // multi-session host like a notebook server (review r15)
    graft.operators.Checkpoints.purgeStopped(tfMemo)(_._1)
    // staleness probe (ADVICE r15): a memoized entry whose backing RDD
    // was unpersisted OUTSIDE the pin discipline (raw rdd.unpersist by
    // external code) is unrecoverable — lineage truncated — and would
    // fail every consumer for the session's lifetime; drop and rebuild
    // instead. Since r17 the shared probe also detects executor/
    // preemption BLOCK LOSS (registration survives, cached partitions
    // < partitions — the entry was fully materialized at build), so a
    // consumer that just failed on a lost block recovers on its next
    // call without a manual [[evictTfStage]]; reliable mode
    // (`spark.graft.checkpoint.reliable=true`) remains the
    // never-fails-once option on spot fleets.
    tfMemo.computeIfPresent((s, dir), { (_, entry) =>
      if (!graft.operators.Checkpoints.stale(entry._1)) entry
      else {
        // release the dead entry's leftover pins so the registry
        // doesn't accumulate ids that no sweep will ever see again
        graft.operators.Checkpoints.unpinAndUnpersist(entry._1)
        null // computeIfPresent contract: null removes the entry
      }
    })
    tfMemo.computeIfAbsent((s, dir), { _ =>
      // PIN the checkpoint's persisted RDD (extracted from the plan's
      // LogicalRDD leaf): a memoized lazy checkpoint swept by a
      // blanket unpersist is unrecoverable — lineage truncated — so
      // every sweep (Checkpoints.unpersistUnpinned) must skip it
      val tf = graft.operators.Checkpoints.pinCheckpointed(
        graft.operators.Checkpoints.truncate(
          tokens(s, dir).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))))
      // whole builder tail under the unpin-on-failure guard —
      // computeIfAbsent stores no entry on throw, so an orphaned pin
      // would be unreachable forever (review r16 passes 2+3: the
      // getLong extraction must sit INSIDE the guard — a NULL sum on
      // an empty corpus throws after collect succeeds)
      graft.operators.Checkpoints.buildPinned(tf) {
        val g = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
          .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).collect()(0)
        (tf, g.getLong(0), g.getLong(1))
      }
    })
  }

  /** Explicit end-of-life for the shared tf stage of (session, dir):
    * removes the memo entry, unpins its checkpoint and releases the
    * persisted blocks (Checkpoints.unpinAndUnpersist — ADVICE r15:
    * pins were otherwise unremovable while the context lived, so a
    * long-lived host querying many dirs accumulated unsweepable
    * blocks). Also the consumer-side recovery hook: a retrieval query
    * failing on lost checkpoint blocks evicts + retries, which
    * rebuilds the stage from source. */
  def evictTfStage(s: SparkSession, dir: String): Unit =
    Option(tfMemo.remove((s, dir))).foreach { case (tf, _, _) =>
      graft.operators.Checkpoints.unpinAndUnpersist(tf)
    }

  /** Sliding-window chunking: windows of [[ChunkSize]] tokens every
    * [[ChunkStride]] (8-token overlap), last window ragged; every doc
    * yields ≥ 1 chunk. Pure narrow per-row flatMap — the whole plan
    * is one codegen'd stage over the scan, nothing shuffles until the
    * presentation sort. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    chunkTransform(docs(s, dir)).orderBy("doc_id", "chunk_id")

  /** The chunking transform alone (no presentation sort) — stateless
    * and narrow, so it runs unchanged on a readStream source
    * ([[graft.streaming.DocsStream.chunkStream]]). */
  private[graft] def chunkTransform(d: DataFrame): DataFrame = {
    // a NULL text yields NO chunks, matching the oracle (whose range
    // join condition against a NULL bound eliminates the doc) — the
    // unguarded form emitted one (chunk_id 0, n_tokens −1, null)
    // row per null doc, a latent oracle divergence on a null-bearing
    // corpus (review r15 pass 2)
    val t = d.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
    t.withColumn("chunk_id",
        explode(sequence(lit(0L),
          expr(s"(greatest(n - $ChunkSize, 0L) + ${ChunkStride - 1}) div $ChunkStride"))))
      .select(col("doc_id"), col("chunk_id"),
        least(col("n") - col("chunk_id") * ChunkStride, lit(ChunkSize.toLong))
          .as("n_tokens"),
        array_join(
          slice(col("toks"), (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize)),
          " ").as("chunk"))
  }

  /** BM25 top-k, query-by-example (each query doc's distinct terms as
    * the query), ln-free rational idf (object scaladoc). Returns
    * (query_id, match_id, score, rk), self-match excluded. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    // the shared tokenize→tf stage + plan-time corpus scalars: one
    // tokenize pass per session, reused by every retrieval row
    val (tf, n, sTok) = tfStage(s, dir)
    // dl DERIVES from the checkpointed tf (Σ tf over a doc's terms IS
    // its token count) — no second pass over the raw token stream
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val q = tf.filter(col("doc_id") < NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    // posting-list candidate generation: broadcast the query terms
    // into the tf (posting) table — work is Σ posting-list lengths of
    // query terms, never |queries| × |corpus|
    val cand = tf.join(broadcast(q), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
    val terms = cand.join(broadcast(dfr), Seq("term")).join(dl, Seq("doc_id"))
      .withColumn("tq", expr(
        s"round((cast(${2 * n + 2}L as double) / cast(2L*df + 1L as double)) * " +
          s"((44d * tf * ${sTok}L) / ((20d * tf * ${sTok}L) + (6d * ${sTok}L) + (18d * dl * ${n}L)))" +
          s" * 1048576d) / 1048576d"))
    val scores = terms.groupBy("query_id", "doc_id")
      .agg(round(sum(col("tq")), 6).as("sim"))
      .select(col("query_id"), col("doc_id").as("match_id"), col("sim"))
    VectorOps.rankTopK(scores, TopK).withColumnRenamed("sim", "score")
  }

  /** Reciprocal Rank Fusion of the sparse (BM25) and dense
    * (trained-IVF ANN) top-k lists: rrf = Σ 1/(60+rank) over the
    * lists a doc appears in, re-ranked. Every arithmetic step is a
    * single IEEE op on identical inputs in both engines (1.0/(60+rk)
    * then one addition), so no lattice snap is needed. The per-query
    * candidate set is ≤ 2·k rows by construction, so the ranking
    * window is bounded regardless of corpus size. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame =
    rrfFuse(bm25TopK(s, dir), VectorOps.annIvfTrainedDefault(s, dir), TopK)

  /** The fusion itself, over any two (query_id, match_id, rk) ranked
    * lists — factored out so the spec can pin the arithmetic on
    * hand-built lists. */
  private[graft] def rrfFuse(sparse: DataFrame, dense: DataFrame,
      k: Int): DataFrame = {
    val sp = sparse.select(col("query_id"), col("match_id"), col("rk").as("rks"))
    val de = dense.select(col("query_id"), col("match_id"), col("rk").as("rkd"))
    val fused = sp.join(de, Seq("query_id", "match_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("rks")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rkd")), lit(0.0)), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("match_id").asc)
    fused.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "match_id", "rrf", "rk")
      .orderBy("query_id", "rk")
  }

  /** Per-doc top-3 TF-IDF keywords (rational idf — same ln-free
    * doctrine as BM25; score = tf·(2N+2)/(2df+1), an exact int ratio).
    * The ranking window partitions by doc_id, whose term count is
    * DOC-LENGTH-bounded — never corpus-bounded — so no pre-prune tier
    * is needed. df rides as a vocabulary-sized broadcast. */
  def keywordTopK(s: SparkSession, dir: String): DataFrame = {
    // N must equal the oracle's count(DISTINCT tok.doc_id): every
    // NON-NULL text yields >= 1 token (split of "" is [""]) but a
    // NULL text yields no tok rows in either engine — [[tfStage]]'s n
    // (docs with ≥ 1 token row) is exactly that count, and its tf is
    // this query's tf (review r14's null-text idf rationale holds)
    val (tf, n, _) = tfStage(s, dir)
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfr), Seq("term"))
      .withColumn("score", round(
        expr(s"cast(${2 * n + 2}L * tf as double) / cast(2L*df + 1L as double)"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "score", "rk")
      .orderBy("doc_id", "rk")
  }

  /** Exact phrase search through the POSITIONAL inverted-index plan
    * shape (`search_phrase`): postings carry (doc, position, term);
    * a phrase query seeds candidates from its FIRST term's posting
    * list (work = that list's length, never the corpus) and each
    * subsequent term is one co-partitioned equi-join on
    * (doc, position+offset) — the adjacency verification a positional
    * index does, as joins Catalyst can shuffle on (doc_id, p).
    * Query-by-example: each query doc's leading bigram is its phrase;
    * output counts exact consecutive occurrences per matching doc,
    * self-matches excluded. The phrase table is query-batch-sized and
    * rides as a broadcast. */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("ts"))
    // positional postings, truncated once — both adjacency sides read it
    val pos = graft.operators.Checkpoints.truncate(
      t.select(col("doc_id"), posexplode(col("ts")).as(Seq("p", "term"))))
    val phrases = t.filter(col("doc_id") < NQueries && size(col("ts")) >= 2)
      .select(col("doc_id").as("query_id"),
        col("ts")(0).as("w1"), col("ts")(1).as("w2"))
    val a = pos.select(col("doc_id").as("match_id"), col("p"), col("term"))
    val b = pos.select(col("doc_id").as("match_id"),
      (col("p") - 1).as("p"), col("term").as("term2"))
    a.join(broadcast(phrases), col("term") === col("w1") &&
        col("match_id") =!= col("query_id"))
      .join(b, Seq("match_id", "p"))
      .filter(col("term2") === col("w2"))
      .groupBy("query_id", "match_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy("query_id", "match_id")
  }

  /** Paragraph-level exact dedup (`dedup_chunk_exact`): duplicate
    * detection at CHUNK granularity — the standard pretraining
    * sub-document pass (boilerplate headers/footers duplicate across
    * documents whose bodies differ, so doc-level hashing misses them).
    * One narrow chunk explode + one hash groupBy shuffle; canonical
    * owner is the lexicographic-min (doc, chunk) via a struct min —
    * no window, no second shuffle. */
  def chunkDedup(s: SparkSession, dir: String): DataFrame =
    chunkTransform(docs(s, dir))
      .withColumn("chunk_hash", md5(col("chunk")))
      .groupBy("chunk_hash")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("c"),
        count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
      .select(col("chunk_hash"), col("c.doc_id").as("canonical_doc"),
        col("c.chunk_id").as("canonical_chunk"), col("n_dups"))
      .orderBy("chunk_hash")

  /** Containment threshold — shared engine/oracle constant: a pair is
    * reported when the SMALLER side's chunk set is at least half
    * inside the other doc. */
  private val ContainThreshold = 0.5

  /** Chunk-level CONTAINMENT near-dup (`dedup_chunk_containment`) —
    * the doc-in-doc detector Jaccard structurally misses: a short doc
    * quoted whole inside a long aggregator has tiny Jaccard (|A|/|B|)
    * but containment |A∩B|/|A| ≈ 1 (Broder 1997's containment
    * resemblance). Chunk sets are the [[chunkTransform]] windows
    * hashed and deduped per doc; both directions are reported and the
    * pair is kept when either rounded containment clears
    * [[ContainThreshold]]. Scale: the chunk-hash equi-join is
    * df-bounded (a boilerplate chunk is the hot key — the
    * winnow.maxFpDf guard pattern applies verbatim); the distinct
    * chunk table is truncated once for its three consumers. */
  def chunkContainment(s: SparkSession, dir: String): DataFrame =
    chunkContainmentPairs(s, dir).orderBy("ida", "idb")

  /** The unsorted containment pair stage — shared by the detection row
    * (`dedup_chunk_containment`, which only adds the output sort) and
    * the transformation it feeds (`pipe_remove_contained_docs`). */
  private[graft] def chunkContainmentPairs(s: SparkSession, dir: String): DataFrame = {
    val h = graft.operators.Checkpoints.truncate(
      chunkTransform(docs(s, dir))
        .select(col("doc_id"), md5(col("chunk")).as("h")).distinct())
    val sizes = h.groupBy("doc_id").agg(count(lit(1)).as("nc"))
    val inter = h.select(col("h"), col("doc_id").as("ida"))
      .join(h.select(col("h"), col("doc_id").as("idb")), Seq("h"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col("doc_id").as("ida"), col("nc").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("nc").as("nb")), "idb")
      .withColumn("c_ab",
        round(col("n_shared").cast("double") / col("na").cast("double"), 6))
      .withColumn("c_ba",
        round(col("n_shared").cast("double") / col("nb").cast("double"), 6))
      .filter(greatest(col("c_ab"), col("c_ba")) >= ContainThreshold)
      .select("ida", "idb", "n_shared", "c_ab", "c_ba")
  }

  /** Turn containment DETECTION into the transformation a curation run
    * executes: drop every doc whose content is (≥ threshold) inside
    * another doc. Drop rule per pair (ida < idb): if only the lower id
    * is contained, IT is dropped (the container keeps the content);
    * mutual containment drops the higher id (the pipe_keep_best
    * keep-lowest doctrine). One-pass pairwise rule — a chain A⊂B⊂C
    * with B dropped still drops A (A's pair with B decides
    * independently), same contract as pipe_clean_corpus's pair drops.
    * Survivors project to (doc_id, lang, n_chars): one tiny anti-join
    * against the pair-derived drop set. */
  def removeContainedDocs(s: SparkSession, dir: String): DataFrame = {
    val pairs = chunkContainmentPairs(s, dir)
    val drop = pairs.select(
      when(col("c_ab") >= ContainThreshold && col("c_ba") < ContainThreshold,
        col("ida")).otherwise(col("idb")).as("doc_id")).distinct()
    docs(s, dir).join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_chunk" -> ((s, dir) => chunkDocs(s, dir)),
    "dedup_chunk_exact" -> ((s, dir) => chunkDedup(s, dir)),
    "dedup_chunk_containment" -> ((s, dir) => chunkContainment(s, dir)),
    "pipe_remove_contained_docs" -> ((s, dir) => removeContainedDocs(s, dir)),
    "search_bm25_topk" -> ((s, dir) => bm25TopK(s, dir)),
    "search_hybrid_rrf" -> ((s, dir) => hybridRrf(s, dir)),
    "search_phrase" -> ((s, dir) => phraseSearch(s, dir)),
    "text_keyword_topk" -> ((s, dir) => keywordTopK(s, dir)))

  /** Shared BM25 CTE chain (SQL twin of [[bm25TopK]] minus the final
    * projection) — also nested by the hybrid oracle. */
  private val bm25Sql: String =
    s"""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        gl AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
        qt AS (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < $NQueries),
        cand AS (
          SELECT qt.query_id, tf.doc_id, tf.term, tf.tf FROM qt JOIN tf USING (term)
          WHERE tf.doc_id <> qt.query_id),
        trm AS (
          SELECT query_id, c.doc_id,
                 round((CAST(2 * gl.n + 2 AS DOUBLE) / CAST(2 * dfr.df + 1 AS DOUBLE))
                       * ((44.0 * c.tf * gl.s) / ((20.0 * c.tf * gl.s) + (6.0 * gl.s) + (18.0 * dl.dl * gl.n)))
                       * 1048576) / 1048576.0 AS tq
          FROM cand c JOIN dfr USING (term) JOIN dl ON dl.doc_id = c.doc_id CROSS JOIN gl),
        bscore AS (SELECT query_id, doc_id, round(sum(tq), 6) AS score FROM trm GROUP BY 1, 2),
        branked AS (
          SELECT query_id, doc_id AS match_id, score,
                 row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rk
          FROM bscore)
        SELECT query_id, match_id, score, rk FROM branked
        WHERE rk <= $TopK ORDER BY query_id, rk"""

  /** Shared chunking CTE chain (t → gs → c) — nested by the
    * text_chunk and dedup_chunk_exact oracles here and by the
    * pipe_full_curation oracle (PipelineOps). */
  private[queries] val chunkCtes: String =
    s"""t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n
          FROM documents),
        -- bounded-range idiom (DuckDB lacks lateral generate_series
        -- over an outer column): covers docs up to 1000 chunks =
        -- ~24k tokens; the Spark side is uncapped, so SearchOpsSpec
        -- asserts the corpus stays far below the bound (max 99
        -- tokens today) — a longer future corpus must raise it
        gs AS (SELECT unnest(range(0, 1000)) AS g),
        c AS (
          SELECT doc_id, CAST(g AS BIGINT) AS chunk_id,
                 least(n - g * $ChunkStride, $ChunkSize) AS n_tokens,
                 array_to_string(
                   toks[(CAST(g * $ChunkStride + 1 AS INT)):(CAST(g * $ChunkStride + $ChunkSize AS INT))],
                   ' ') AS chunk
          FROM t JOIN gs ON g <= (greatest(n - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride)"""

  /** Containment pair CTE chain (SQL twin of [[chunkContainmentPairs]]
    * minus the threshold filter) — shared by the detection and removal
    * oracles. */
  private val containCtes: String =
    s"""$chunkCtes,
        h AS (SELECT DISTINCT doc_id, md5(chunk) AS h FROM c),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc FROM h GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS BIGINT) AS n_shared
          FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sc AS (
          SELECT ida, idb, n_shared,
                 round(CAST(n_shared AS DOUBLE) / CAST(sa.nc AS DOUBLE), 6) AS c_ab,
                 round(CAST(n_shared AS DOUBLE) / CAST(sb.nc AS DOUBLE), 6) AS c_ba
          FROM inter
          JOIN sizes sa ON sa.doc_id = ida
          JOIN sizes sb ON sb.doc_id = idb)"""

  def oracle: Map[String, String] = Map(
    "text_chunk" ->
      s"""WITH $chunkCtes
          SELECT doc_id, chunk_id, n_tokens, chunk FROM c ORDER BY doc_id, chunk_id""",
    "dedup_chunk_exact" ->
      s"""WITH $chunkCtes,
          h AS (SELECT md5(chunk) AS chunk_hash, doc_id, chunk_id FROM c),
          g2 AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_dups
                 FROM h GROUP BY 1),
          canon AS (
            SELECT chunk_hash, doc_id AS canonical_doc, chunk_id AS canonical_chunk,
                   row_number() OVER (PARTITION BY chunk_hash
                                      ORDER BY doc_id, chunk_id) AS rk
            FROM h)
          SELECT g2.chunk_hash, canonical_doc, canonical_chunk, n_dups
          FROM g2 JOIN canon USING (chunk_hash)
          WHERE rk = 1 AND n_dups > 1
          ORDER BY chunk_hash""",
    // distinct chunk-hash sets per doc, pairwise intersection via the
    // hash equi-join, containment both directions; the threshold
    // compares ROUNDED values in both engines so the boundary can
    // never flake on representation
    "dedup_chunk_containment" ->
      s"""WITH $containCtes
          SELECT ida, idb, n_shared, c_ab, c_ba
          FROM sc WHERE greatest(c_ab, c_ba) >= $ContainThreshold
          ORDER BY ida, idb""",
    // the same sc pair table drives the drop set (only-lower-contained
    // → lower id; otherwise the higher id), anti-joined back onto the
    // corpus — the engine's removeContainedDocs drop rule verbatim
    "pipe_remove_contained_docs" ->
      s"""WITH $containCtes,
          drop AS (
            SELECT DISTINCT CASE WHEN c_ab >= $ContainThreshold
                                  AND c_ba < $ContainThreshold
                             THEN ida ELSE idb END AS doc_id
            FROM sc WHERE greatest(c_ab, c_ba) >= $ContainThreshold)
          -- length(text), not strlen(text): the engine's n_chars is
          -- Spark length() = CHARACTERS; strlen counts BYTES and would
          -- diverge on any non-ASCII doc (ADVICE r16 — matches the
          -- pipe_clean_corpus convention)
          SELECT doc_id, lang, length(text) AS n_chars
          FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM drop)
          ORDER BY doc_id""",
    "search_bm25_topk" -> bm25Sql,
    "search_phrase" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          q AS (SELECT doc_id AS query_id, ts[1] AS w1, ts[2] AS w2
                FROM t WHERE doc_id < $NQueries AND len(ts) >= 2),
          gs AS (SELECT unnest(range(1, 1024)) AS i),
          pos AS (SELECT doc_id, CAST(i AS INT) AS p, ts[CAST(i AS INT)] AS term,
                         ts[CAST(i AS INT) + 1] AS term2
                  FROM t JOIN gs ON i <= len(ts) - 1)
          SELECT q.query_id, pos.doc_id AS match_id,
                 CAST(count(*) AS BIGINT) AS n_occurrences
          FROM q JOIN pos
            ON pos.term = q.w1 AND pos.term2 = q.w2 AND pos.doc_id <> q.query_id
          GROUP BY 1, 2 ORDER BY query_id, match_id""",
    "text_keyword_topk" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
          dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          gl AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
          sc AS (
            SELECT doc_id, term,
                   round(CAST((2 * gl.n + 2) * tf AS DOUBLE) / CAST(2 * dfr.df + 1 AS DOUBLE), 6) AS score
            FROM tf JOIN dfr USING (term) CROSS JOIN gl),
          krk AS (
            SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
            FROM sc)
          SELECT doc_id, term, score, rk FROM krk WHERE rk <= 3
          ORDER BY doc_id, rk""",
    "search_hybrid_rrf" ->
      s"""WITH sp AS MATERIALIZED ($bm25Sql),
          de AS MATERIALIZED (${VectorOps.oracle("vec_ann_ivf_trained")}),
          fused AS (
            SELECT coalesce(sp.query_id, de.query_id) AS query_id,
                   coalesce(sp.match_id, de.match_id) AS match_id,
                   round(coalesce(1.0 / ($RrfK + sp.rk), 0) +
                         coalesce(1.0 / ($RrfK + de.rk), 0), 6) AS rrf
            FROM sp FULL OUTER JOIN de
              ON sp.query_id = de.query_id AND sp.match_id = de.match_id),
          rranked AS (
            SELECT query_id, match_id, rrf,
                   row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, match_id ASC) AS rk
            FROM fused)
          SELECT query_id, match_id, rrf, rk FROM rranked
          WHERE rk <= $TopK ORDER BY query_id, rk""")
}
