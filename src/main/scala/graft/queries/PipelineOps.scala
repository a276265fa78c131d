package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.multimodal.MultimodalOps

/** Streaming-capable event transforms (batch-checked against the
  * oracle; the identical transform runs under readStream in
  * EventsStreamSpec) and multimodal binary-column plumbing. */
object PipelineOps {

  /** Scene-cut SAD threshold — ONE constant drives the engine
    * predicate and the oracle SQL (review r15 pass 3: bare twin
    * literals coupled only by a comment). Calibrated between the
    * corpus transition median (~911) and p90 (~1071). */
  private val SceneCutThreshold = 1000L

  /** Video near-dup frame model: 72-byte frames (the 9×8 dHash
    * thumbnail — the mm_phash_pairs kernel per FRAME), frame-hash
    * grams of [[VideoGramK]] hashes winnowed over windows of
    * [[VideoWinnowW]]. Guarantee: two videos sharing an aligned clip
    * of ≥ K + W − 1 = 3 identical-dHash frames share a fingerprint. */
  private val VideoFrameBytes = 72
  private val VideoGramK = 2
  private val VideoWinnowW = 2

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Document corpus scan — the BARE reader, same doctrine as
    * [[TextOps.docs]]: the fresh-JVM `spark.graft.fanout` A/B showed a
    * wholesale fan-out exchange costs 1.4–2.9× on every cheap per-doc
    * kernel row (mm_scene_cut, mm_video_neardup, pipe_dsir_weights,
    * dedup_chunk_exact …) and only pays where the fused kernel is
    * genuinely expensive. The one such consumer here — the FLAC
    * encode+decode round-trip of `mm_flac_decode` (0.44 → 0.21 s) —
    * fans out at its own call site. The events table likewise stays
    * bare: every consumer's first operation is a user-key shuffle. */
  private def docsT(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  /** Winnow fingerprint table (k=20, w=4) over a documents frame —
    * the shared detection stage of [[pipe_decontaminate]],
    * `dedup_substring_pairs` and [[fullCuration]]. Narrow (~len/w
    * fingerprints per doc, no shuffle); NOT distinct — call sites
    * that must not multiply pair weight dedup themselves. */
  private def winnowFps(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    // fanned (guide §2.5, the selective doctrine): the winnow rolling-
    // hash kernel is the one fused pipe kernel expensive enough to
    // outweigh the exchange when a single-row-group scan plans one
    // task (measured 0.5+ CPU-s single-threaded in the
    // dedup_substring_pairs profile; fresh-JVM A/B over the
    // spark.graft.fanout toggle quoted in OPTIMIZATION_r21.md)
    graft.operators.FanOut(d.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        graft.functions.Winnow.fingerprints(text, 20, 4).iterator.map(fp => (id, fp))
      })
      .toDF("doc_id", "fp")
  }

  /** Deterministic messy-URL builder for [[canonicalizeUrl]]'s ledger
    * row: the corpus has no URL column, so one is derived per doc from
    * (doc_id, source) — mirrored verbatim in the DuckDB oracle — with
    * residue-keyed variation hitting every canonicalization rule.
    * The path key folds odd-hundreds ids ending in 7 onto their
    * even-hundreds counterpart (same source — the corpus assigns
    * source round-robin mod 20, and Δ100 ≡ 0 mod 20), so a
    * SCALE-STABLE ~5% of docs pair into canonical-URL duplicates for
    * the keep-best stage — a realistic web-corpus URL-dup rate that
    * keeps fullCuration's stage 0 from swallowing the corpus (the
    * first doc_id%50 key collided 100-apart ids into 5-deep groups:
    * 80% dropped, and worse as the corpus grows). */
  private def messyUrl: Column = concat(
    when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("HTTPS://")),
    when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0, col("source")).otherwise(upper(col("source"))),
    lit(".example.com"),
    when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
    lit("/docs/"),
    expr("CAST(CASE WHEN (doc_id DIV 100) % 2 = 1 AND doc_id % 10 = 7 " +
      "THEN doc_id - 100 ELSE doc_id END AS STRING)"),
    when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 11 === 0 && col("doc_id") % 13 === 0,
        lit("?utm_source=feed&page=2"))
      .when(col("doc_id") % 11 === 0, lit("?utm_source=feed"))
      .when(col("doc_id") % 13 === 0, lit("?page=2"))
      .otherwise(lit("")),
    when(col("doc_id") % 17 === 0, lit("#section-3")).otherwise(lit("")))

  /** Canonicalize a URL column the way web-pipeline dedup does before
    * keying: drop the fragment, lowercase scheme and host, strip
    * leading `www.` prefixes (all of them) and the scheme's OWN
    * default port (`:443` for https, `:80` for http — a non-default
    * port is a distinct origin and survives), strip ALL trailing
    * slashes from the path (empty → `/`), and drop tracking query
    * params (`utm_*`, `fbclid`, `gclid`) while keeping the rest. Pure
    * codegen'd string functions — no UDF — and IDEMPOTENT:
    * canon(canon(u)) == canon(u) (UrlCanonSpec property, incl. the
    * `www.www.` / `//`-terminated shapes one-at-a-time stripping
    * broke). Path/query case is preserved (only scheme+host
    * lowercase): URLs are case-sensitive past the authority. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // default-port strip is SCHEME-AWARE (review r18): :80 on https
    // (and :443 on http) is a real, distinct origin — conflating it
    // with the default-port page would silently drop a different
    // document in the keep-best stage
    val noPort = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    // (www\.)+ and /+$ strip REPEATED occurrences: one-at-a-time
    // stripping broke the documented idempotence on 'www.www.' hosts
    // and '//'-terminated paths (review r18)
    val host = regexp_replace(noPort, "^(www\\.)+", "")
    val rest = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val stripped = regexp_replace(path0, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query0 = when(rest.contains("?"),
      regexp_extract(rest, "\\?(.*)$", 1)).otherwise(lit(""))
    val kept = array_join(
      filter(split(query0, "&"),
        x => x =!= "" && !x.rlike("^(utm_[^=]*|fbclid|gclid)=")), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** (doc_id, canon_url, keep) for a documents frame — the shared
    * URL-dedup decision of the standalone `pipe_url_dedup` row and
    * [[fullCuration]]'s stage 0 (one rule, two consumers): keep the
    * longest doc per canonical URL, ties to the lowest id. The window
    * runs over collision-group-sized partitions keyed by the
    * canonical URL — never a global sort. */
  private[graft] def urlKeepBest(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("canon_url")
      .orderBy(col("n_chars").desc, col("doc_id"))
    urlCanon(d).withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("canon_url"), (col("rn") === 1).as("keep"))
  }

  /** The blocklist gate transform — shared by the `pipe_badwords_filter`
    * gate row and its stateless streaming twin
    * ([[graft.streaming.DocsStream.badwordsStream]]): per-doc count of
    * tokens in the (broadcast-in-production) blocklist, keep while the
    * bad fraction stays under 5% — cross-multiplied integers
    * (n_bad·20 < n_tokens), never a float ratio. One narrow codegen'd
    * map, so it runs unchanged on a streaming input (the union over
    * any micro-batch cuts equals the batch result row-for-row). The
    * two-word list stands in for the usual few-hundred-entry set
    * (array_contains over a literal array IS the broadcast shape). */
  private[graft] def badwordsGate(d: DataFrame): DataFrame =
    badwordsVerdictCols(d).select(col("doc_id"),
      col("__bw_n_tokens").as("n_tokens"), col("__bw_n_bad").as("n_bad"),
      col("__bw_keep").as("keep"))

  /** Row-preserving form of the SAME blocklist verdict: docs surviving
    * the gate with their full row intact, so the composed ingest
    * (stage-0 keep-best → blocklist → curate,
    * [[graft.streaming.DocsStream.curateGated]]) can continue into the
    * curation tail. One rule, two shapes — both project from
    * [[badwordsVerdictCols]], so the gate row and the composition
    * cannot drift (round 20). */
  private[graft] def badwordsKeepDocs(d: DataFrame): DataFrame =
    badwordsVerdictCols(d).filter(col("__bw_keep"))
      .drop("__bw_n_tokens", "__bw_n_bad", "__bw_keep")

  /** Single owner of the blocklist arithmetic: per-doc token count,
    * blocklist-token count, and the 5% keep rule as cross-multiplied
    * integers (n_bad·20 < n_tokens — never a float ratio), appended
    * as `__bw_`-prefixed columns that cannot collide with document
    * schema fields. */
  private def badwordsVerdictCols(d: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val bad = array(lit("slow"), lit("big"))
    d.filter(col("text").isNotNull)
      .withColumn("__bw_n_tokens", size(toks))
      .withColumn("__bw_n_bad", size(filter(toks, t => array_contains(bad, t))))
      .withColumn("__bw_keep", col("__bw_n_bad") * 20 < col("__bw_n_tokens"))
  }

  /** `(doc_id, n_chars, canon_url)` projection — the shared input of
    * the batch keep-best window above AND its streaming running-best
    * twin ([[graft.streaming.DocsStream.urlDedupStream]]): one
    * canonicalization, two consumers, no rule drift. */
  private[graft] def urlCanon(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("n_chars"), messyUrl.as("url"))
      .withColumn("canon_url", canonicalizeUrl(col("url")))
      .select("doc_id", "n_chars", "canon_url")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The integrated training-data preparation pipeline: token/quality
    // gate → near-duplicate removal (MinHash-LSH candidates, exact-
    // verified — the scale path, proven equal to the exact baseline) →
    // clean corpus. Duplicate policy: for every near-dup pair (a<b),
    // the higher id is dropped (deterministic canonicalization).
    "pipe_clean_corpus" -> ((s, dir) => {
      val docs = docsT(s, dir)
      val toks = split(col("text"), " ")
      val quality = docs
        .withColumn("n_tokens", size(toks))
        .filter(col("n_tokens") >= 10 && length(col("text")) >= 60)
      // shared LSH stage, unsorted (the standalone query's output sort
      // would cost an extra full execution for range-bound sampling
      // here); the dup-id set is tiny → localCheckpoint it LAZILY so
      // the signature+bucket+verify pipeline executes exactly once, at
      // first action, and the anti-join reuses the materialized blocks
      // (at 100 TB this is "persist the signature/pair table", same
      // shape). Lazy, not eager: building this DataFrame must not run
      // the LSH job — SchemaDriftSpec analyzes every query without
      // executing it (ADVICE r9).
      val dupIds = TextOps.minhashNearDupPairs(s, dir)
        .select(col("idb").as("dup_id")).distinct()
        .localCheckpoint(eager = false)
      quality.join(dupIds, quality("doc_id") === dupIds("dup_id"), "left_anti")
        .select("doc_id", "n_tokens", "lang")
        .orderBy("doc_id")
    }),

    // URL-level dedup (VERDICT r17 missing #3) — the standard FIRST
    // stage of every web-scale pipeline (C4/RefinedWeb dedup on
    // canonicalized URL before any content pass): canonicalize, then
    // keep-best per canonical key (longest doc, ties to lowest id —
    // the pipe_keep_best policy). The corpus has no URL column, so a
    // deterministic messy URL is derived per doc from (doc_id, source)
    // inside the query — identically in the oracle — exercising every
    // canonicalization rule: scheme/host case, www. prefix, default
    // port, trailing slash, tracking params, fragments. Scale: pure
    // codegen'd string maps + one window over collision-group-sized
    // partitions (the canonical key is the partitioner — never a
    // global sort). Canonicalization is idempotent (UrlCanonSpec).
    "pipe_url_dedup" -> ((s, dir) =>
      urlKeepBest(docsT(s, dir)).orderBy("doc_id")),

    // Blocklist filtering (round 18) — the C4-style banned-word gate
    // every web curation pipeline runs; the transform lives in
    // [[badwordsGate]] (shared with the round-19 streaming twin
    // DocsStream.badwordsStream — one rule, two consumers).
    "pipe_badwords_filter" -> ((s, dir) =>
      badwordsGate(docsT(s, dir)).orderBy("doc_id")),

    // tumbling 1h window aggregation (streaming-capable transform)
    "ev_window_agg" -> ((s, dir) =>
      EventsStream.windowedCounts(t(s, dir, "events"))
        .orderBy("window_start_s", "event_type")),

    // 30-minute-gap sessionization per user
    "ev_sessionize" -> ((s, dir) =>
      EventsStream.sessionize(t(s, dir, "events"))
        .orderBy("user_id", "event_id")),

    // per-session summary — the aggregate view product analytics
    // actually reads (duration, depth): the SAME shared session
    // assignment stage, then one (user, session) aggregation; exact
    // integer µs arithmetic end to end
    "ev_session_stats" -> ((s, dir) =>
      EventsStream.sessionized(t(s, dir, "events"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")),

    // first-order Markov transition matrix over per-user event
    // sequences — behavior-model estimation: one per-user lead window
    // (the ev_top_paths shuffle shape), then |types|²-bounded counts;
    // P(to|from) an exact count ratio finished by one rounded double
    // division. At 100 TB the only data-sized stage is the user
    // shuffle; the matrix is vocabulary-bounded.
    "ev_markov_transition" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val pairs = ev.withColumn("ts_us", graft.streaming.EventTime.tsUs(ev))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("ft"))
      pairs.join(totals, "from_type")
        .withColumn("p", round(col("n").cast("double") / col("ft").cast("double"), 6))
        .select("from_type", "to_type", "n", "p")
        .orderBy("from_type", "to_type")
    }),

    // stream-stream interval join, batch form: views paired with the
    // user's clicks within the following hour (EventsStream
    // .viewClickJoin runs the same plan under readStream)
    "ev_view_click_join" -> ((s, dir) =>
      EventsStream.viewClickJoin(t(s, dir, "events"))
        .orderBy("view_id", "click_id")),

    // AS-OF (backward) join: each click paired with the user's latest
    // view at-or-before it. Spark has no ASOF JOIN operator; the scale
    // shape is NOT a join at all — union both sides into one stream,
    // ONE shuffle on user_id, and `last(_, ignoreNulls)` over an
    // ordered running window carries the most recent view forward.
    // Wall-clock and shuffle volume are that of a single window
    // aggregation regardless of how skewed the view/click ratio is,
    // where a per-click range probe would degenerate. Clicks before
    // any view keep a NULL view_id (left-join semantics). Order within
    // equal timestamps is (ts, event_id) — total, so both engines
    // resolve ties identically.
    "ev_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = t(s, dir, "events")
      // µs domain via the schema-adaptive adapter — the precision the
      // oracle engine reads the parquet timestamps at (epoch_us)
      ev.withColumn("ts_us", graft.streaming.EventTime.tsUs(ev))
        .withColumn("vid", when(col("event_type") === "view", col("event_id")))
        .withColumn("vts", when(col("event_type") === "view", col("ts_us")))
        .withColumn("view_id", last(col("vid"), ignoreNulls = true).over(w))
        .withColumn("last_vts", last(col("vts"), ignoreNulls = true).over(w))
        .withColumn("gap_us", col("ts_us") - col("last_vts"))
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("view_id"), col("gap_us"))
        .orderBy("click_id")
    }),

    // range join: every 200th event is a "probe" owning the half-open
    // 30-minute window [ts, ts+30min); count + sum all events falling
    // in each window. Spark's built-in strategies would plan the raw
    // inequality join as a broadcast nested loop; the scale shape is
    // bucketization — each probe explodes into the hour buckets its
    // window covers (≤ 2 here), events key by their own bucket, and an
    // EQUI-join on bucket carries the residual range predicate. The
    // all-pairs comparison space shrinks to per-bucket cells and every
    // stage shuffles on a key, so the plan survives both sides growing
    // 100x. Overlap factor = window/bucket width + 1, a 2x row
    // expansion of the (small) probe side only.
    "ev_range_join" -> ((s, dir) => {
      // µs domain throughout (EventTime.tsUs): the oracle engine reads
      // the timestamps at µs precision, and mixing domains could miss
      // an event within 1 µs of a bucket boundary
      val bucketUs = 3600L * 1000000L
      val winUs = 1800L * 1000000L
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("ts_us", graft.streaming.EventTime.tsUs(ev0))
      val probes = ev.filter(col("event_id") % 200 === 0)
        .select(col("event_id").as("probe_id"), col("ts_us").as("start_us"),
          (col("ts_us") + winUs).as("end_us"))
        .withColumn("bucket", explode(sequence(
          expr(s"start_us div $bucketUs"), expr(s"(end_us - 1) div $bucketUs"))))
      val byBucket = ev.withColumn("bucket", expr(s"ts_us div $bucketUs"))
      probes.join(byBucket, Seq("bucket"))
        .filter(col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_events"),
          // decimal accumulation: exact, engine-order-independent
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy("probe_id")
    }),

    // RFM segmentation (recency / frequency / monetary) — the classic
    // customer-value quartile grid, over purchase events: days since
    // last purchase (µs integer DIV — the ev_retention day-bucket
    // rule), purchase count, and the decimal-exact value sum, each
    // quartiled by the scale-safe DistributedRank ntile (complete
    // (metric, user_id) orders — no single-partition window at any
    // corpus size) and composed into the 111..444 segment code. The
    // corpus high-water timestamp is one plan-time scalar (the
    // a12-bloom bounded tier). Users with no purchase have no RFM row
    // by definition.
    "ev_rfm" -> ((s, dir) => {
      import graft.operators.DistributedRank
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), graft.streaming.EventTime.tsUs(ev).as("us"),
          col("value"))
      // zero purchases => max(us) is NULL: fold to 0 and let the
      // empty pipeline flow through — the oracle's empty table, not a
      // driver NPE (review r15)
      val mxRow = p.agg(max(col("us"))).collect()(0)
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val u = p.groupBy("user_id").agg(
        expr(s"(${mx}L - max(us)) DIV 86400000000").as("r_days"),
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("monetary"))
      val r1 = DistributedRank.withNtile(u, Seq.empty,
          Seq(col("r_days"), col("user_id")), 4)
        .withColumnRenamed("nt", "r_q").drop("grank", "gcount")
      val r2 = DistributedRank.withNtile(r1, Seq.empty,
          Seq(col("n_purchases"), col("user_id")), 4)
        .withColumnRenamed("nt", "f_q").drop("grank", "gcount")
      val r3 = DistributedRank.withNtile(r2, Seq.empty,
          Seq(col("monetary"), col("user_id")), 4)
        .withColumnRenamed("nt", "m_q").drop("grank", "gcount")
      r3.withColumn("segment", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
        .select("user_id", "r_days", "n_purchases", "monetary",
          "r_q", "f_q", "m_q", "segment")
        .orderBy("user_id")
    }),

    // Position-based (U-shaped 40/20/40) multi-touch attribution:
    // every purchase distributes exactly 100 credit hundredths over
    // its view/click touches in the 7-day lookback — first and last
    // touch 40 each, the middle 20 split by integer div with the
    // remainder to the earliest middles (n=1 → 100, n=2 → 50/50).
    // Integer credits are the pipe_mix_weighted doctrine: exact,
    // engine-independent, and per-conversion sums are EXACTLY 100
    // (AttributionSpec pins it). The touch×conversion pairing is the
    // ev_range_join bucketization — conversions explode into the 8
    // day-buckets their lookback covers and the join is EQUI on
    // (user_id, day) with the residual range predicate, so the
    // comparison space stays per-(user, day)-cell at any scale; the
    // position window partitions by conv_id (per-conversion touch
    // count is activity-bounded, never corpus-bounded).
    "ev_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayUs = 86400L * 1000000L
      val lookUs = 7L * dayUs
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("ts_us", graft.streaming.EventTime.tsUs(ev0))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts_us").as("cts"))
        .withColumn("bucket", explode(sequence(
          expr(s"(cts - $lookUs) div $dayUs"), expr(s"cts div $dayUs"))))
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("event_type").as("touch_type"), col("ts_us").as("tts"))
        .withColumn("bucket", expr(s"tts div $dayUs"))
      val cand = conv.join(touch, Seq("user_id", "bucket"))
        .filter(col("tts") < col("cts") && col("tts") >= col("cts") - lookUs)
      val wOrd = Window.partitionBy("conv_id").orderBy("tts", "touch_id")
      cand
        .withColumn("idx", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("conv_id")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("credit", expr(
          """cast(case when n = 1 then 100 when n = 2 then 50
                       when idx = 1 or idx = n then 40
                       else 20 div (n - 2) +
                            (case when idx - 2 < 20 % (n - 2) then 1 else 0 end)
                  end as int)"""))
        .select("conv_id", "touch_id", "touch_type", "credit")
        .orderBy("conv_id", "touch_id")
    }),

    // dedup-on-ingest, batch form: first event (by event time) per
    // (user_id, event_type); EventsStream.dedupStream is the
    // state-store streaming twin (EventsStreamSpec). Ordering is
    // µs-domain (ts_us, event_id) like every other event-time window
    // in this family — one ordering domain across both engines, so
    // sub-µs timestamp ties (legacy ns fixtures) cannot tie-break
    // differently between Spark and the oracle (ADVICE r9).
    "ev_dedup_first" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val ev = t(s, dir, "events")
      ev.withColumn("ts_us", graft.streaming.EventTime.tsUs(ev))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    }),

    // multimodal: binary media column → batched mapPartitions feature
    // extraction (oracle covers the byte stats; the stubbed decode path
    // and fingerprint are pinned in MultimodalSpec)
    "mm_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(s, MultimodalOps.docsAsMedia(docsT(s, dir)))
        .select(col("id").as("doc_id"), col("n_bytes"), col("n_distinct_bytes"))
        .orderBy("doc_id")),

    // full feature row incl. entropy + FNV fingerprint
    "mm_features_full" -> ((s, dir) =>
      MultimodalOps.extractFeatures(s, MultimodalOps.docsAsMedia(docsT(s, dir)))
        .select(col("id").as("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
          round(col("entropy"), 6).as("entropy"), col("fingerprint"))
        .orderBy("doc_id")),

    // REAL image resize in the correctness gate: each doc's first 63
    // bytes (zero-padded) become a 7x9 grayscale image — width 7 forces
    // BMP row padding (21 → 24 bytes/row), height 9 → 4 forces
    // non-integer nearest-neighbor source mapping — encoded as 24bpp
    // BMP, resized through ImageCodec.resizeNearest (decode → scale →
    // re-encode), decoded AGAIN, and reduced to order-sensitive pixel
    // statistics. The oracle recomputes the same statistics from the
    // text bytes via the nearest-neighbor index map, so a broken row
    // stride, padding copy, bottom-up flip, or source-index rounding
    // fails the hash. (MultimodalOps.resize — the codec-free byte
    // stub — remains API surface, pinned by WinnowSpec.)
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      val bmps = docsT(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val px = java.util.Arrays.copyOf(text.getBytes("UTF-8"), 63)
          (id, graft.multimodal.ImageCodec.encodeBmp(
            graft.multimodal.ImageCodec.Image(7, 9, 1, px)), "image/bmp")
        }).toDF("id", "media", "kind")
      MultimodalOps.resizeImages(s, bmps, 5, 4)
        .select("id", "media").as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bmp) =>
          val img = graft.multimodal.ImageCodec.decode(bmp).get
          // source was gray expanded to BGR; toGray inverts exactly
          val g = graft.multimodal.ImageCodec.toGray(img)
          var sum = 0L
          var i = 0
          while (i < g.data.length) { sum += g.data(i) & 0xff; i += 1 }
          // order-sensitive fingerprint over row-major pixels — the
          // shared kernel keeps this in lockstep with the SQL oracle
          (id, sum, graft.functions.Fnv64.hash(g.data))
        })
        .toDF("doc_id", "px_sum", "px_fp")
        .orderBy("doc_id")
    }),

    // REAL PNG decode in the correctness gate (VERDICT r10 task 3):
    // same 7x9-grayscale-from-text-bytes construction as mm_resize,
    // but encoded as a REAL PNG via the JDK's javax.imageio and decoded
    // back through ImageCodec's magic-dispatch path (zlib inflate, PNG
    // filters, raster band read — all the JDK decoder's work) before
    // the nearest-neighbor resize and BMP round-trip. PNG is lossless,
    // so the pixels reaching the statistics are bit-identical to the
    // text bytes and the SAME SQL oracle as mm_resize applies: a
    // defect anywhere in PNG encode → decode → resize → BMP encode →
    // decode changes px_fp. (JPEG stays golden-spec-only: its decoded
    // pixels are decoder-dependent — ImageCodecSpec.)
    "mm_png_decode" -> ((s, dir) => {
      import s.implicits._
      val pngs = docsT(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val px = java.util.Arrays.copyOf(text.getBytes("UTF-8"), 63)
          (id, graft.multimodal.ImageCodec.encodePng(
            graft.multimodal.ImageCodec.Image(7, 9, 1, px)), "image/png")
        }).toDF("id", "media", "kind")
      MultimodalOps.resizeImages(s, pngs, 5, 4)
        .select("id", "media").as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bmp) =>
          val img = graft.multimodal.ImageCodec.decode(bmp).get
          // PNG source was 1-channel gray; encodeBmp expanded it to
          // r=g=b BGR, which toGray inverts exactly
          val g = graft.multimodal.ImageCodec.toGray(img)
          var sum = 0L
          var i = 0
          while (i < g.data.length) { sum += g.data(i) & 0xff; i += 1 }
          (id, sum, graft.functions.Fnv64.hash(g.data))
        })
        .toDF("doc_id", "px_sum", "px_fp")
        .orderBy("doc_id")
    }),

    // REAL GIF decode in the correctness gate: same 7x9 gray-from-text
    // construction, through the JDK GIF writer (exact 8-bit gray
    // palette) and back through ImageCodec's IndexColorModel expansion
    // path (LZW inflate + palette resolution — the decoder work PNG
    // doesn't exercise). Gray GIF is lossless, so the SAME pixel
    // oracle as mm_resize/mm_png_decode applies; the decoded image
    // arrives as r=g=b BGR (palette expansion), which toGray inverts
    // exactly.
    "mm_gif_decode" -> ((s, dir) => {
      import s.implicits._
      val gifs = docsT(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val px = java.util.Arrays.copyOf(text.getBytes("UTF-8"), 63)
          (id, graft.multimodal.ImageCodec.encodeGif(
            graft.multimodal.ImageCodec.Image(7, 9, 1, px)), "image/gif")
        }).toDF("id", "media", "kind")
      MultimodalOps.resizeImages(s, gifs, 5, 4)
        .select("id", "media").as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bmp) =>
          val img = graft.multimodal.ImageCodec.decode(bmp).get
          val g = graft.multimodal.ImageCodec.toGray(img)
          var sum = 0L
          var i = 0
          while (i < g.data.length) { sum += g.data(i) & 0xff; i += 1 }
          (id, sum, graft.functions.Fnv64.hash(g.data))
        })
        .toDF("doc_id", "px_sum", "px_fp")
        .orderBy("doc_id")
    }),

    // REAL audio decode in the correctness gate: each doc's first 64
    // bytes (zero-padded) become 32 signed 16-bit LE PCM samples in a
    // real RIFF/WAVE container, decoded back through AudioCodec's
    // chunk-walking parser (header offsets, word alignment, sign
    // extension — all the parser's work). The oracle recomputes the
    // sample statistics directly from the text bytes, so a
    // header-offset, byte-order, or sign-extension defect fails the
    // hash. (Compressed audio stays stubbed: the JDK ships no MP3/AAC
    // decoder.)
    "mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      docsT(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val bytes = java.util.Arrays.copyOf(text.getBytes("UTF-8"), 64)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = Array.tabulate(32)(i => bb.getShort(i * 2))
          val wav = graft.multimodal.AudioCodec.encodeWav(
            graft.multimodal.AudioCodec.Audio(8000, 1, samples))
          val a = graft.multimodal.AudioCodec.decode(wav).get
          var sum = 0L
          a.samples.foreach(sum += _)
          val le = graft.multimodal.AudioCodec.pcmBytes(a)
          (id, a.samples.length, sum,
            graft.multimodal.AudioCodec.zeroCrossings(a),
            graft.functions.Fnv64.hash(le))
        })
        .toDF("doc_id", "n_samples", "sample_sum", "zero_crossings", "sample_fp")
        .orderBy("doc_id")
    }),

    // REAL compressed-audio decode in the correctness gate (VERDICT
    // r17 missing #1 — the last multimodal stub retired): the same 32
    // samples as mm_wav_decode, but through a real FLAC encode →
    // decode (frame sync, CRC-8/CRC-16 verification, fixed-predictor
    // + Rice-residual reconstruction — FlacCodec). FLAC is LOSSLESS,
    // so the decoded PCM equals the source samples exactly and the
    // oracle is the SAME sample-statistics contract as mm_wav_decode
    // — any defect in bit unpacking, zigzag decode, predictor order,
    // or CRC handling fails the hash. Text bytes make smooth AND
    // noisy signals, so CONSTANT/FIXED/VERBATIM subframes all occur
    // across the corpus.
    "mm_flac_decode" -> ((s, dir) => {
      import s.implicits._
      // FLAC encode+decode per doc is the one docsT kernel heavy
      // enough for a fan-out exchange (0.44 -> 0.21 s measured)
      graft.operators.FanOut(
          docsT(s, dir).select(col("doc_id"), col("text"))).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val bytes = java.util.Arrays.copyOf(
            (if (text == null) "" else text).getBytes("UTF-8"), 64)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = Array.tabulate(32)(i => bb.getShort(i * 2))
          val flac = graft.multimodal.FlacCodec.encodeFlac(
            graft.multimodal.AudioCodec.Audio(8000, 1, samples))
          val a = graft.multimodal.FlacCodec.decode(flac).get
          var sum = 0L
          a.samples.foreach(sum += _)
          (id, a.samples.length, sum,
            graft.multimodal.AudioCodec.zeroCrossings(a),
            graft.functions.Fnv64.hash(graft.multimodal.AudioCodec.pcmBytes(a)))
        })
        .toDF("doc_id", "n_samples", "sample_sum", "zero_crossings", "sample_fp")
        .orderBy("doc_id")
    }),

    // REAL audio resample in the correctness gate: the mm_wav_decode
    // PCM (32 samples @ 8 kHz from the doc's first 64 bytes) runs
    // WAV-encode → chunk-walk decode → linear 8 kHz→12 kHz resample
    // (exact integer interpolation on the k·in/out rational grid —
    // AudioCodec.resampleLinear), and the oracle recomputes the 47
    // interpolated samples directly from the text bytes: a truncation
    // vs floor defect, an off-grid position, or a byte-order slip in
    // the resampled PCM fails the hash.
    "mm_audio_resample" -> ((s, dir) => {
      import s.implicits._
      docsT(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          // null text = empty payload (zero-padded), matching the
          // oracle's bytes CTE which keeps the doc with b=0 everywhere
          // (CASE … ELSE 0 is null-falsy); a row-drop here would
          // diverge — and the unguarded getBytes NPE'd (ADVICE r15)
          val bytes = java.util.Arrays.copyOf(
            (if (text == null) "" else text).getBytes("UTF-8"), 64)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = Array.tabulate(32)(i => bb.getShort(i * 2))
          val a = graft.multimodal.AudioCodec.decode(
            graft.multimodal.AudioCodec.encodeWav(
              graft.multimodal.AudioCodec.Audio(8000, 1, samples))).get
          val r = graft.multimodal.AudioCodec.resampleLinear(a, 12000)
          var sum = 0L
          r.samples.foreach(sum += _)
          (id, r.samples.length, sum,
            graft.multimodal.AudioCodec.zeroCrossings(r),
            graft.functions.Fnv64.hash(graft.multimodal.AudioCodec.pcmBytes(r)))
        })
        .toDF("doc_id", "n_samples", "sample_sum", "zero_crossings", "sample_fp")
        .orderBy("doc_id")
    }),

    // Scene-cut detection — the video-curation primitive on top of
    // the frame model: consecutive 32-byte frames differenced
    // per-byte (sum of absolute differences, the classic shot-boundary
    // signal), a transition is a CUT when SAD ≥ 1000 (between the
    // corpus median ~911 and p90 ~1071 — a meaningful split, not a
    // degenerate flag). One narrow pass, integer arithmetic only; at
    // scale this is a per-video mapPartitions over the frame stream,
    // no shuffle before the presentation sort.
    "mm_scene_cut" -> ((s, dir) => {
      import s.implicits._
      docsT(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val bytes = text.getBytes("UTF-8")
            val nf = bytes.length / 32
            (1 until nf).iterator.map { f =>
              var diff = 0L
              var j = 0
              while (j < 32) {
                diff += math.abs((bytes(f * 32 + j) & 0xff) - (bytes((f - 1) * 32 + j) & 0xff))
                j += 1
              }
              (id, f, diff, if (diff >= SceneCutThreshold) 1 else 0)
            }
          }
        }).toDF("doc_id", "frame_ix", "diff", "is_cut")
        .orderBy("doc_id", "frame_ix")
    }),

    // MULTIMODAL NEAR-DUP DEDUP — the perceptual bridge between the
    // media family and the dedup family: each doc's first 72 bytes
    // become a 9×8 grayscale thumbnail (through the real PGM
    // encode→decode path), dHash gives the classic 64-bit perceptual
    // fingerprint (one brighter-than bit per adjacent pixel pair),
    // and the SAME lossless banding/sub-split machinery as text
    // SimHash emits all pairs within hamming ≤ 3 — visually-near
    // duplicates. At scale this is how image corpora dedup: a 64-bit
    // key per image, band-bucketed, never all-pairs.
    "mm_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      val dh = docsT(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          // null text = all-zero thumbnail (dHash 0), matching the
          // oracle's bits CTE (NULL comparisons are falsy → v=0 per
          // bit); a row-drop would diverge — ADVICE r15 null guard
          val px = java.util.Arrays.copyOf(
            (if (text == null) "" else text).getBytes("UTF-8"), 72)
          val img = graft.multimodal.ImageCodec.decode(
            graft.multimodal.ImageCodec.encodePgm(
              graft.multimodal.ImageCodec.Image(9, 8, 1, px))).get
          (id, graft.multimodal.ImageCodec.dhash64(img))
        }).toDF("doc_id", "simhash")
      TextOps.fingerprintPairs(dh, 3).orderBy("ida", "idb")
    }),

    // VIDEO-level near-dup — the clip generalization of mm_phash_pairs:
    // each doc's bytes are a frame stream (72-byte frames = the 9×8
    // dHash thumbnail per frame), the ordered per-frame dHash sequence
    // is winnowed (k=2 frame-grams, w=2 windows — the MOSS rule over
    // hash VALUES instead of characters), and videos sharing a
    // fingerprint pair up via one fp-keyed equi-join. Two clips
    // sharing ≥ 3 aligned frames (216 bytes of video) are guaranteed a
    // shared fingerprint even when everything around the clip differs.
    // Scale shape = dedup_substring_pairs: a narrow per-video map
    // (nf−1 grams, ~nf/w fingerprints), then a bucketed equi-join on
    // the fingerprint — never all-pairs, and the winnow.maxFpDf
    // df-guard pattern applies verbatim if a stock clip goes viral.
    "mm_video_neardup" -> ((s, dir) => {
      import s.implicits._
      val fps = docsT(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          // null text = no frames (oracle's strlen(NULL) range is
          // empty) — the mm_scene_cut convention
          if (text == null) Iterator.empty
          else {
            val bytes = text.getBytes("UTF-8")
            val nf = bytes.length / VideoFrameBytes
            val hashes = Array.tabulate(nf) { f =>
              val px = java.util.Arrays.copyOfRange(
                bytes, f * VideoFrameBytes, (f + 1) * VideoFrameBytes)
              val img = graft.multimodal.ImageCodec.decode(
                graft.multimodal.ImageCodec.encodePgm(
                  graft.multimodal.ImageCodec.Image(9, 8, 1, px))).get
              graft.multimodal.ImageCodec.dhash64(img)
            }
            graft.functions.Winnow
              .fingerprintsLongs(hashes, VideoGramK, VideoWinnowW)
              .iterator.map(fp => (id, fp))
          }
        }).toDF("doc_id", "fp").distinct()
      val a = fps.select(col("fp"), col("doc_id").as("ida"))
      val b = fps.select(col("fp"), col("doc_id").as("idb"))
      a.join(b, Seq("fp")).filter(col("ida") < col("idb"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("n_shared"))
        .orderBy("ida", "idb")
    }),

    // multimodal frame sampling: every 4th 32-byte "frame", each frame
    // reduced to content statistics (byte sum + order-sensitive FNV) so
    // the oracle verifies the frame PAYLOAD — an off-by-one frame
    // offset or short copy fails the hash, not just a length check
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      MultimodalOps.sampleFrames(s, MultimodalOps.docsAsMedia(docsT(s, dir)), 32, 4)
        .select("id", "frame_ix", "frame").as[(Long, Int, Array[Byte])]
        .mapPartitions(_.map { case (id, ix, frame) =>
          var sum = 0L
          var i = 0
          while (i < frame.length) { sum += frame(i) & 0xff; i += 1 }
          (id, ix, frame.length, sum, graft.functions.Fnv64.hash(frame))
        })
        .toDF("doc_id", "frame_ix", "frame_bytes", "frame_sum", "frame_fp")
        .orderBy("doc_id", "frame_ix")
    }),

    // REAL image decode in the correctness gate: each doc's first 64
    // bytes (zero-padded) become an 8x8 grayscale PGM, and features run
    // through MediaCodec's decode path — so the oracle (which computes
    // the same statistics directly from the text bytes) pins
    // encode ∘ decode == identity plus the feature math. A broken
    // header writer, comment parser, or row copy fails this row.
    "mm_image_roundtrip" -> ((s, dir) => {
      import s.implicits._
      docsT(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val px = java.util.Arrays.copyOf(text.getBytes("UTF-8"), 64)
          val pgm = graft.multimodal.ImageCodec.encodePgm(
            graft.multimodal.ImageCodec.Image(8, 8, 1, px))
          val f = MultimodalOps.MediaCodec.features(id, pgm)
          (id, f.n_bytes, f.n_distinct_bytes, f.entropy, f.fingerprint)
        })
        .toDF("doc_id", "n_bytes", "n_distinct_bytes", "entropy", "fingerprint")
        .withColumn("entropy", round(col("entropy"), 6))
        .orderBy("doc_id")
    }),

    // winnowing fingerprints (MOSS rolling-hash scheme; oracle
    // replicates the k-gram hash + rightmost-min window rule in SQL;
    // shared-substring guarantee pinned in WinnowSpec)
    "text_winnow" -> ((s, dir) => {
      import s.implicits._
      docsT(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val fps = graft.functions.Winnow.fingerprints(text, 5, 4)
          (id, fps.length, fps.headOption.getOrElse(0L))
        })
        .toDF("doc_id", "n_fingerprints", "min_fp")
        .orderBy("doc_id")
    }),

    // Benchmark DECONTAMINATION — the test-set-overlap removal step of
    // a training pipeline: drop every corpus doc sharing ANY winnowing
    // fingerprint with the benchmark set (stand-in benchmark: doc_id %
    // 97 == 0; in production an external table). Winnow fingerprints
    // catch shared substrings of >= w+k-1 chars regardless of position
    // (the MOSS guarantee), so verbatim quotation of a benchmark
    // passage contaminates. Scale: the fingerprint table is
    // ~len/w rows per doc (narrow map), the benchmark fingerprint set
    // is small and broadcast into the semi-join, and the final
    // anti-join keys on doc_id — no all-pairs anything.
    "pipe_decontaminate" -> ((s, dir) => {
      val d = docsT(s, dir)
      // k=20 shingles (w=4 → shared runs of >= 23 chars contaminate):
      // short shingles collide on common phrases and would flag the
      // whole corpus; 20 chars is in the spirit of the 13-token
      // overlap units used for LM benchmark decontamination
      val fps = winnowFps(s, d)
      val benchFps = fps.filter(col("doc_id") % 97 === 0).select("fp").distinct()
      val contaminated = fps.join(benchFps, Seq("fp"), "left_semi")
        .select("doc_id").distinct()
      d.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // DSIR importance weighting — see [[dsirWeights]]; the oracle
    // replays the FixedLog integer shift-and-square chain per bucket
    "pipe_dsir_weights" -> ((s, dir) => dsirWeights(s, dir)),

    // Cohort retention: users bucketed by first-seen UTC day, counted
    // once per (cohort, day-offset) they were active on. Day buckets
    // are exact integer µs division (86.4e9), so both engines bucket
    // identically. Two aggregations + one user-keyed join — all
    // shuffles key on user_id / (cohort, offset); no window over the
    // raw stream.
    "ev_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // integer `div`, not `/`: double division of a ~2^51 µs value can
      // round up across an exact day boundary before the cast
      // truncates. Negative (pre-epoch) µs values are parity-safe as
      // is: Spark's `div` and DuckDB's integer `//` BOTH truncate
      // toward zero (verified: -1 // 86400000000 = 0 in DuckDB).
      val e = ev.select(col("user_id"),
          graft.streaming.EventTime.tsUs(ev).as("tu"))
        .withColumn("d", expr("tu div 86400000000"))
        .select("user_id", "d")
      val first = e.groupBy("user_id").agg(min("d").as("d0"))
      e.join(first, "user_id")
        .select(col("user_id"), col("d0"), (col("d") - col("d0")).as("off"))
        .distinct()
        .groupBy(col("d0").as("cohort_day"), col("off").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Ordered conversion funnel per user: earliest view, then the
    // earliest click STRICTLY after it, then the earliest purchase
    // strictly after that (µs domain, ties ordered (tu, event_id) per
    // the event-time doctrine; strict > means an equal-µs step never
    // advances the funnel — deterministic in both engines). ONE
    // shuffle on user_id + a streaming sorted-run walk per partition:
    // the greedy first-qualifying-event scan over (tu, event_id) order
    // equals the nested min-after-min semantics, because a qualifying
    // step can only appear after its predecessor in sort order. State
    // is O(1) per user; output is one row per user.
    "ev_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val sorted = ev.select(col("user_id"),
          graft.streaming.EventTime.tsUs(ev).as("tu"),
          col("event_type"), col("event_id"))
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("tu"), col("event_id"))
        .as[(Long, Long, String, Long)]
      sorted.mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Option[Long], Option[Long], Option[Long])]
        var cur = 0L
        var open = false
        var t1, t2, t3 = -1L
        def close(): Unit = if (open) {
          val stage = if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0
          out += ((cur, stage,
            if (t1 >= 0) Some(t1) else None,
            if (t2 >= 0) Some(t2) else None,
            if (t3 >= 0) Some(t3) else None))
        }
        it.foreach { case (u, tu, tpe, _) =>
          if (!open || u != cur) { close(); cur = u; open = true; t1 = -1; t2 = -1; t3 = -1 }
          tpe match {
            case "view"     => if (t1 < 0) t1 = tu
            case "click"    => if (t2 < 0 && t1 >= 0 && tu > t1) t2 = tu
            case "purchase" => if (t3 < 0 && t2 >= 0 && tu > t2) t3 = tu
            case _          => ()
          }
        }
        close()
        out.iterator
      }.toDF("user_id", "stage", "t1_us", "t2_us", "t3_us")
        .orderBy("user_id")
    }),

    // Cross-document exact-substring overlap pairs — the detection
    // core of substring-level dedup (Lee et al. 2021, "Deduplicating
    // Training Data...", done the winnowing way instead of a suffix
    // array): two docs sharing ANY winnow fingerprint (k=20, w=4)
    // share a verbatim run of >= 23 chars (the MOSS guarantee), so
    // every emitted pair is a TRUE substring overlap — no verification
    // stage. n_shared counts distinct shared fingerprints (a proxy for
    // overlap mass). Scale: fingerprints are a narrow ~len/w-per-doc
    // map; the pair join keys on fp and its output is the answer
    // itself. A boilerplate-heavy production corpus bounds it with the
    // standard shingle-df guard: set `spark.graft.winnow.maxFpDf` > 0
    // and fingerprints appearing in more than that many documents (a
    // license header in every file would otherwise emit C(n,2) pairs
    // on its own) are dropped BEFORE the pair join — an anti join
    // against the tiny over-cap fp set. Default 0 (off) keeps exact
    // oracle parity; SubstringPairsSpec pins the collapse under cap.
    "dedup_substring_pairs" -> ((s, dir) => {
      val raw = winnowFps(s, docsT(s, dir))
        .distinct() // an fp repeated INSIDE one doc must not multiply pair weight
      val maxDf = s.conf.get("spark.graft.winnow.maxFpDf", "0").toInt
      val fps = if (maxDf <= 0) raw else {
        // two consumers (df histogram + anti join) — materialize the
        // fingerprint stage once, lazily (shared-stage doctrine)
        val cp = raw.localCheckpoint(eager = false)
        val hot = cp.groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select("fp")
        // no broadcast hint: the over-cap set is usually tiny (AQE
        // will broadcast it), but its worst case is fps/cap — a forced
        // broadcast would be the OOM at exactly the corpus the guard
        // exists for
        cp.join(hot, Seq("fp"), "left_anti")
      }
      val a = fps.select(col("fp"), col("doc_id").as("ida"))
      val b = fps.select(col("fp"), col("doc_id").as("idb"))
      a.join(b, Seq("fp")).filter(col("ida") < col("idb"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("n_shared"))
        .orderBy("ida", "idb")
    }),

    // Span-REMOVAL substring dedup (`pipe_remove_dup_spans`) — the
    // transformation the detection stack feeds (Lee et al. 2022,
    // "Deduplicating Training Data Makes Language Models Better":
    // cut every cross-document verbatim span, keep the first
    // occurrence). See [[removeDupSpans]].
    "pipe_remove_dup_spans" -> ((s, dir) => removeDupSpans(s, dir)),

    // End-to-end curation integration: six stages in ONE declarative
    // plan — quality gate → chunk-exact dedup → MinHash near-dup
    // removal → benchmark decontamination → PII mask → weighted mix +
    // train split. See [[fullCuration]].
    "pipe_full_curation" -> ((s, dir) => fullCuration(s, dir)),

    // PII masking/redaction — the regex scrub step of a training
    // pipeline. The synthetic corpus carries no real PII, so the query
    // first derives a deterministic contact tail per doc (email +
    // phone) and then masks it back out: the assertion under test is
    // the REDACTION plumbing (global regexp_replace + match counting)
    // with patterns restricted to the Java-regex ∩ RE2 common subset
    // so both engines see identical semantics. Narrow, shuffle-free,
    // codegen'd — at 100 TB the cost is the scan.
    "pipe_pii_mask" -> ((s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
      val contact = concat(col("text"), lit(" reach user"),
        col("doc_id").cast("string"), lit("@mail.example or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      docsT(s, dir)
        .withColumn("contact", contact)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("contact"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("masked"),
          regexp_count(col("contact"), lit(emailRe)).as("n_emails"),
          regexp_count(col("contact"), lit(phoneRe)).as("n_phones"))
        .orderBy("doc_id")
    }),

    // Gap-filled hourly resample with last-observation-carried-forward
    // (LOCF) — the feature-pipeline step that turns an irregular event
    // stream into a dense per-user time grid. Join-free like the as-of
    // join: union the grid markers with the events, ONE shuffle on
    // user, and a running `last(value, ignoreNulls)` window in
    // (tu, is_grid, event_id) order carries each value forward (events
    // sort before the grid marker at the same µs, so "at-or-before" is
    // exact). Grid starts at the first full hour after the user's
    // first event, so every grid point has a value — no null edge. The
    // value column passes through untouched (no arithmetic on the
    // doubles), keeping the hash gate exact.
    "ev_locf_resample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourUs = 3600000000L
      val ev0 = t(s, dir, "events")
      val e = ev0.select(col("user_id"),
        graft.streaming.EventTime.tsUs(ev0).as("tu"),
        col("value"), col("event_id"))
      val span = e.groupBy("user_id")
        .agg((min(expr(s"tu div $hourUs")) + 1).as("h0"),
          max(expr(s"tu div $hourUs")).as("h1"))
        .filter(col("h1") >= col("h0"))
      val grid = span.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
      val u = e.select(col("user_id"), col("tu"), lit(0).as("is_grid"),
          col("event_id"), col("value"), lit(null).cast("long").as("h"))
        .unionByName(grid.select(col("user_id"),
          (col("h") * hourUs).as("tu"), lit(1).as("is_grid"),
          lit(Long.MaxValue).as("event_id"),
          lit(null).cast("double").as("value"), col("h")))
      val w = Window.partitionBy("user_id")
        .orderBy("tu", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("v", last(col("value"), ignoreNulls = true).over(w))
        .filter(col("is_grid") === 1)
        .select(col("user_id"), col("h").as("hour_bucket"), col("v").as("value"))
        .orderBy("user_id", "hour_bucket")
    }),

    // Sliding-window event counts (1 h window, 15 min slide): each
    // event belongs to exactly window/slide = 4 windows, generated by
    // a narrow 4-way explode of integer window indices — the same
    // µs-integer bucket math as the tumbling twin (ev_window_agg), so
    // cross-engine exact where timestamp window() functions differ.
    // One shuffle on (window, type); output is slide-granular.
    "ev_sliding_agg" -> ((s, dir) => {
      val slideUs = 900000000L
      val winUs = 3600000000L
      val ev = t(s, dir, "events")
      ev.select(graft.streaming.EventTime.tsUs(ev).as("tu"), col("event_type"))
        .withColumn("i", explode(sequence(lit(0), lit(3))))
        .withColumn("ws", (expr(s"tu div $slideUs") - col("i")) * slideUs)
        .filter(col("ws") >= 0 && col("tu") < col("ws") + winUs)
        .groupBy(expr("ws div 1000000").as("window_start_s"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("window_start_s", "event_type")
    }),

    // Extreme-value outlier flagging — the robust (rank-based) form of
    // anomaly detection a cleaning pipeline runs per metric: events in
    // the top 1% of value within their event_type. percent_rank over a
    // COMPLETE order (value, event_id) is pure rank arithmetic —
    // (rank-1)/(n-1) from identical integers in both engines — so
    // unlike mean/std z-scores over raw doubles it is cross-engine
    // exact. The rank itself comes from DistributedRank (range-
    // partitioned slices + per-slice row_number + prior-count offset),
    // NOT a `PARTITION BY event_type` window: event_type has ~3
    // values, so the window form funnels each type's ENTIRE history
    // through one task at 100 TB (VERDICT r11 #1). Same integer ranks,
    // same double division, every stage partitioned — PlanLintSpec
    // pins the plan free of Exchange SinglePartition.
    "ev_anomaly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.DistributedRank.withPercentRank(
          ev.select(col("event_id"), col("event_type"), col("value")),
          Seq("event_type"), Seq(col("value"), col("event_id")))
        .filter(col("pr") >= 0.99)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // Top event trigrams ("paths"): per-user ordered windows (the
    // engine's µs-domain (tu, event_id) ordering contract) slide a
    // 3-event frame via two leads — one shuffle on user_id for the
    // window, then a tiny path-keyed aggregate (cardinality ≤
    // |event_type|³). The heavy step is the window over raw events;
    // lead() keeps it a single pass, no self-joins. Top-k is
    // deterministic: count DESC then path.
    "ev_top_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("tu", "event_id")
      ev.select(col("user_id"), col("event_type"), col("event_id"),
          graft.streaming.EventTime.tsUs(ev).as("tu"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(25)
        .orderBy(col("n").desc, col("path"))
    })
  )

  /** Span-removal substring dedup — turns the detection the winnow
    * family does (`dedup_substring_pairs`) into the TRANSFORMATION a
    * production curation run executes (Lee et al. 2022): every
    * verbatim cross-document span of ≥ [[DupSpanMinChars]] chars is
    * CUT from the higher-id document; the lexicographically-first
    * (lowest-id) owner keeps its copy — the pipe_keep_best doctrine
    * at span granularity.
    *
    * Mechanics (exact, not sampled): per-position k-grams (k =
    * [[DupSpanGram]], the raw 20-char substring as the join key — so
    * a matched diagonal RUN is verbatim by construction, no
    * hash-collision caveat); matches against LOWER-id docs group by
    * (doc, owner, diagonal) and gaps-and-islands turns consecutive
    * positions into maximal runs; runs of ≥ 31 grams = spans of
    * ≥ 50 chars; per-doc interval union (overlap-or-adjacent merge)
    * then one `aggregate` higher-order fold cuts the spans out of the
    * text — no per-char explode on the output side.
    *
    * Scale (100 TB): the gram table is a narrow per-row explode
    * (~len rows/doc); the only data-sized shuffles key on gram /
    * (doc, owner, diag) / doc, and every window partition is
    * doc-length-bounded. Join volume is Σ per-gram df² — the true
    * overlap mass, not all-pairs; a boilerplate-heavy corpus bounds
    * it with `spark.graft.dupspans.maxGramDf` (> 0 drops grams
    * appearing in more than that many documents BEFORE the pair
    * join — the dedup_substring_pairs shingle-df guard; default 0 =
    * exact/unbounded, BUT GUARDED (VERDICT r16 #3): the unbounded
    * path verifies the join's total candidate volume Σ occurrence²
    * against [[DupSpanGuardPairs]] (conf
    * `spark.graft.dupspans.guardPairs`) and fails loudly past it
    * instead of silently running a quadratic join on corpus-common
    * boilerplate grams — the repo's fail-with-named-bound doctrine
    * (pivot.maxKeys). The occurrence table is one gram-keyed
    * aggregation over the already-materialized gram stage — linear,
    * session-memoized — vs the quadratic join it gates. At
    * winnow-candidate scale the pair prefilter from
    * `dedup_substring_pairs` can gate the positional join entirely. */
  private[graft] val DupSpanGram = 20
  private[graft] val DupSpanMinChars = 50

  /** Unbounded-mode ceiling on the positional self-join's TOTAL
    * candidate volume, Σ_gram occurrence² — the exact pair count the
    * join will produce (review r17: bounding only the single hottest
    * gram missed the many-medium-templates corpus where every gram
    * stays under a per-gram cap but the SUM is still a runaway). 10⁸
    * pairs ≈ the point where this stops being a plan; occurrence
    * counting needs no distinct pass, and the same aggregation yields
    * the hottest gram for the error message. A corpus legitimately
    * past the bound must choose its recall trade explicitly via
    * `spark.graft.dupspans.maxGramDf`. */
  private[graft] val DupSpanGuardPairs = 100000000L

  /** Session memo of the corpus's (Σ occ², hottest occ) guard scalars
    * — properties of (corpus, gram size) alone. */
  private val dupSpanOccMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Long, Long)]()

  /** Evict the memoized dup-span guard scalars for (session, dir) —
    * the memo-lifecycle sibling of evictTfStage / evictGraphEdges /
    * evictTokenizerModels (ADVICE r17): a corpus rewritten in place
    * at the same dir within a session must call this (like every
    * corpus-refresh path calls the other hooks) or the guard serves
    * stale scalars and could admit a now-hot corpus. */
  def evictDupSpanStats(s: SparkSession, dir: String): Unit =
    dupSpanOccMemo.remove((s, dir))

  def removeDupSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = DupSpanGram
    val minRun = DupSpanMinChars - k + 1 // 31: run length ⇒ span ≥ 50 chars
    val d = docsT(s, dir)
    val d0 = d.filter(length(col("text")) >= k) // null-safe: length(NULL) filters out
    // spread the gram explode BEFORE it fans out: a single-file gate
    // corpus scans as ONE task, which made the r17 guard's map-side
    // aggregation (and the checkpoint write) single-threaded — a 20x
    // row regression. The doc rows are tiny pre-explode, so this
    // round-robin exchange is ~free; a many-file 100 TB scan already
    // exceeds the target parallelism and is left untouched.
    val sp = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val dSpread = if (d0.rdd.getNumPartitions < sp) d0.repartition(sp) else d0
    val g0 = dSpread
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (k - 1))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"), expr(s"substring(text, pos, $k)").as("gram"))
    val maxDf = s.conf.get("spark.graft.dupspans.maxGramDf", "0").toInt
    // the gram stage feeds the guard/df-filter AND both pair-join
    // sides — materialize it once (lazily)
    val cp = graft.operators.Checkpoints.truncate(g0)
    val g =
      if (maxDf > 0)
        // the recall-trade cap is DOCUMENT frequency (the Lee-style
        // notion a caller reasons about); only this opt-in path pays
        // the distinct
        graft.operators.Checkpoints.truncate(
          cp.join(cp.select("doc_id", "gram").distinct()
              .groupBy("gram").agg(count(lit(1)).as("df"))
              .filter(col("df") > maxDf).select("gram"),
            Seq("gram"), "left_anti"))
      else {
        // unbounded = exact, but never silently quadratic: verify the
        // join's TOTAL candidate volume Σ occ² (plus the hottest gram
        // for the message) against the named bound — one gram-keyed
        // aggregation, no distinct pass — and fail with the conf to
        // set. The scalars are properties of (corpus, k) alone, so
        // they are SESSION-MEMOIZED like every corpus-stats stage
        // (tfStage doctrine): the first call pays one linear
        // aggregation (~10 CPU-s at sf0.1, the r17 20x row-regression
        // lesson), every later call is a map lookup; the threshold
        // check itself runs per call, so a too-hot corpus throws
        // every time, not just once
        val guard = s.conf.get("spark.graft.dupspans.guardPairs",
          DupSpanGuardPairs.toString).toLong
        graft.operators.Checkpoints.purgeStopped(dupSpanOccMemo)(_._1)
        val (vol, hi) = dupSpanOccMemo.computeIfAbsent((s, dir), { _ =>
          // occ² in DECIMAL, not LongType (ADVICE r17): a gram with
          // ≥ ~3.04e9 occurrences overflows long occ² — under ANSI an
          // opaque ArithmeticException instead of the guard's named
          // bound, without ANSI a silent wrap that can turn vol
          // NEGATIVE and wave the runaway corpus through. dec(19,0)²
          // → dec(38,0) holds any long² exactly; a sum past long
          // range (or a decimal-overflow null with grams present)
          // clamps to Long.MaxValue — certainly over any guard.
          cp.groupBy("gram").agg(count(lit(1)).as("occ"))
            .agg(sum(col("occ").cast("decimal(19,0)") *
                col("occ").cast("decimal(19,0)")).as("vol"),
              max(col("occ")).as("hi"), count(lit(1)).as("ng"))
            .collect().headOption
            // NULL aggregates on an empty/too-short corpus = no grams
            .map { r =>
              val longMax = new java.math.BigDecimal(Long.MaxValue)
              val v =
                if (!r.isNullAt(0)) {
                  val bd = r.getDecimal(0)
                  if (bd.compareTo(longMax) > 0) Long.MaxValue
                  else bd.longValueExact()
                } else if (r.getLong(2) > 0) Long.MaxValue
                else 0L
              (v, if (r.isNullAt(1)) 0L else r.getLong(1))
            }
            .getOrElse((0L, 0L))
        })
        if (vol > guard) throw new IllegalStateException(
          s"removeDupSpans: the positional self-join would produce $vol " +
            s"candidate pairs (> guard $guard; hottest $DupSpanGram-gram " +
            s"occurs $hi times) — a silent runaway on corpus-common " +
            "boilerplate. Set spark.graft.dupspans.maxGramDf to choose " +
            "the recall trade explicitly (grams above that doc frequency " +
            "are skipped), or raise spark.graft.dupspans.guardPairs " +
            "deliberately.")
        cp
      }
    val a = g.select(col("gram"), col("doc_id").as("ida"), col("pos").as("pa"))
    val b = g.select(col("gram"), col("doc_id").as("idb"), col("pos").as("pb"))
    val mt = a.join(b, Seq("gram")).filter(col("ida") < col("idb"))
      .select(col("idb"), col("pb"), col("ida"), (col("pb") - col("pa")).as("dg"))
    // gaps-and-islands on each (doc, owner, diagonal): consecutive pb
    // runs are maximal verbatim matches
    val wRun = Window.partitionBy("idb", "ida", "dg").orderBy("pb")
    val spans = mt
      .withColumn("isl", col("pb") - row_number().over(wRun))
      .groupBy("idb", "ida", "dg", "isl")
      .agg(min(col("pb")).as("s"), (max(col("pb")) + (k - 1)).as("e"),
        count(lit(1)).as("rl"))
      .filter(col("rl") >= minRun)
      .select("idb", "s", "e").distinct()
    // per-doc interval union: overlap-or-adjacent spans merge into
    // maximal removed char runs
    val wIv = Window.partitionBy("idb").orderBy("s", "e")
    val iv = spans
      .withColumn("pmax", max(col("e")).over(
        wIv.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(
        wIv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("idb", "grp")
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val ivAgg = iv.groupBy("idb").agg(
      sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"),
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s") + 1).as("n_chars_removed"))
    // one fold over the (doc-bounded) interval array cuts the spans:
    // acc = (prev end, kept text so far); finish appends the tail
    val cut = expr(
      """aggregate(ivs,
           named_struct('pe', 0, 'acc', cast('' as string)),
           (ac, x) -> named_struct(
             'pe', x.e,
             'acc', concat(ac.acc, substring(text, ac.pe + 1, x.s - ac.pe - 1))),
           ac -> concat(ac.acc, substring(text, ac.pe + 1, length(text) - ac.pe)))""")
    d.join(ivAgg, col("doc_id") === col("idb"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_chars_removed"), lit(0L)).as("n_chars_removed"),
        when(col("ivs").isNull, col("text")).otherwise(cut).as("clean_text"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance weights (`pipe_dsir_weights`, Xie et al.
    * 2023 "Data Selection for Language Models via Importance
    * Resampling"): score every document by the log-likelihood ratio of
    * a TARGET distribution vs the RAW corpus under hashed bag-of-ngram
    * models — the standard curation stage that up-weights data
    * resembling a quality target. Target stand-in: the `doc_id % 97`
    * benchmark subset (the pipe_decontaminate convention; in
    * production an external table).
    *
    * Model: unigram tokens hash into [[DsirBuckets]] buckets
    * (`pmod(fnv64(term), B)`); bucket probabilities are add-one
    * smoothed counts, so the per-bucket log-ratio is
    *   llr(b) = log2( (ct(b)+1)·(Tr+B) / ((cr(b)+1)·(Tt+B)) )
    * computed on the 2^-20 integer lattice by the cross-engine-exact
    * [[graft.functions.FixedLog]] shift-and-square kernel (NOT libm —
    * the ln-free doctrine). A doc's weight is the exact BIGINT sum of
    * its tokens' lattice llrs; `log2_weight` divides by 2^20
    * (dyadic-exact) for presentation.
    *
    * Scale (100 TB): exactly two corpus passes, both narrow scans —
    * one bucket-keyed count aggregation (B rows collected: the
    * kmeans-centroid model tier, Tr/Tt derived from the same rows so
    * no second scalar job), one scoring pass re-hashing tokens and
    * joining the BROADCAST B-row llr table, then a doc-keyed sum.
    * Nothing shuffles at corpus size except the per-doc aggregation,
    * which keys on doc_id. The oracle unrolls the integer log steps as
    * a nest() chain over the bucket CTE. */
  private[graft] val DsirBuckets = 128

  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = DsirBuckets
    val bucketed = docsT(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(col("text"), " ", -1)).as("term"))
      .select(col("doc_id"),
        pmod(expr("fnv64(term)"), lit(B.toLong)).as("bucket"))
    // ONE aggregation yields raw and target counts per bucket (≤ B
    // rows — model tier); totals derive from the collected rows
    val counts = bucketed.groupBy("bucket").agg(
        count(lit(1)).as("cr"),
        sum(when(col("doc_id") % 97 === 0, 1L).otherwise(0L)).as("ct"))
      .collect()
    val tr = counts.map(_.getLong(1)).sum
    val tt = counts.map(_.getLong(2)).sum
    // oracle-twin domain bound (ADVICE r17): the DuckDB twin computes
    // (num · 2^60) in HUGEINT (int128), so any ratio argument must stay
    // below 2^67 or the oracle errors on the INTERMEDIATE while this
    // BigInt side sails on — a silent cross-engine asymmetry. Fail
    // loudly on the same bound instead: it needs (count+1)·(total+B)
    // ≥ 2^67 ≈ 1.5e20, i.e. ~1e10 bucket tokens × ~1e10 total — far
    // past any real corpus, and a ≤ B-row driver check.
    val hugeintCap = BigInt(1) << 67
    counts.foreach { r =>
      val (cr, ct) = (r.getLong(1), r.getLong(2))
      val worst = (BigInt(ct + 1) * BigInt(tr + B))
        .max(BigInt(cr + 1) * BigInt(tt + B))
      require(worst < hugeintCap,
        s"dsirWeights: bucket ${r.getLong(0)} ratio argument $worst ≥ 2^67 " +
          "— the DuckDB oracle twin's HUGEINT (int128) would overflow on " +
          "num·2^60. Shard the corpus or widen FixedLog's oracle scaling " +
          "before trusting cross-engine parity at this token volume.")
    }
    val llr = counts.toSeq.map { r =>
      val (cr, ct) = (r.getLong(1), r.getLong(2))
      (r.getLong(0), graft.functions.FixedLog.log2Fixed(
        BigInt(ct + 1) * BigInt(tr + B), BigInt(cr + 1) * BigInt(tt + B)))
    }.toDF("bucket", "llr")
    bucketed.join(broadcast(llr), Seq("bucket"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"), sum(col("llr")).as("log2w_num"))
      .select(col("doc_id"), col("n_tokens"), col("log2w_num"),
        round(col("log2w_num") / 1048576.0, 6).as("log2_weight"))
      .orderBy("doc_id")
  }

  /** The end-to-end curation integration row (`pipe_full_curation`):
    * the already-proven stages composed in ONE plan/session —
    *   0. URL-level dedup (keep-best per canonical URL —
    *      pipe_url_dedup's decision, round 18: the C4/RefinedWeb
    *      stage every web pipeline runs before content passes),
    *   1. quality gate (token/length floors — pipe_clean_corpus's),
    *   2. chunk-exact dedup (drop docs holding a duplicated chunk
    *      whose canonical owner is another doc — dedup_chunk_exact's
    *      min-struct canon, pipe_keep_best doctrine),
    *   3. MinHash-LSH near-dup removal (verified pairs, higher id
    *      drops — pipe_clean_corpus's policy),
    *   4. benchmark decontamination (winnow-fingerprint overlap with
    *      the doc_id % 97 benchmark subset — pipe_decontaminate's),
    *   5. PII masking (the fixture contact synthesis + global regex
    *      redaction — pipe_pii_mask's),
    *   6. mixture weighting + train/val/test split
    *      (pipe_mix_weighted + pipe_train_split's integer-exact
    *      hundredths/bucket arithmetic).
    *
    * Drop sets are computed corpus-globally and SUBTRACTED (set
    * subtraction commutes, so stage order can't change the answer and
    * the oracle composes the existing per-stage CTEs verbatim). Each
    * drop set is duplicate-mass-sized — tiny vs the corpus — so the
    * single unioned anti-join broadcasts under AQE; the narrow stages
    * (quality, mask, mix, split) fuse into the surviving-docs scan.
    * Total cost ≈ the three detection stages alone, sub-additive vs
    * running the six standalone rows (the bench row pins it). The
    * near-dup pair stage reuses pipe_clean_corpus's lazy
    * localCheckpoint so LSH signatures materialize exactly once. */
  /** Stage 1 (quality gate) — STATELESS, shared verbatim by the batch
    * integration row and the streaming twin
    * ([[graft.streaming.DocsStream.curate]]) so the two cannot drift. */
  private[graft] def qualityGate(d: DataFrame): DataFrame =
    d.withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_tokens") >= 10 && length(col("text")) >= 60)

  /** Stages 5–6 (PII mask, mixture weights, split label) — STATELESS
    * per-doc arithmetic over (doc_id, lang, source, text, n_tokens),
    * shared by [[fullCuration]] and the streaming twin. No sort here:
    * a continuous sink cannot order; the batch row adds its
    * presentation orderBy after. */
  private[graft] def curationTail(surv: DataFrame): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val contact = concat(col("text"), lit(" reach user"),
      col("doc_id").cast("string"), lit("@mail.example or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val masked = surv.withColumn("masked",
      regexp_replace(regexp_replace(contact, emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val w100 = (srcNum % 4) * 75 + 50
    val hash = (col("doc_id") * lit(48271L)) % 65536L % 100L
    masked
      .withColumn("reps",
        (w100 / 100).cast("int") + when(hash < w100 % 100, 1).otherwise(0))
      .filter(col("reps") >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(1), col("reps"))).as("copy"),
        when(hash < 90, "train").when(hash < 95, "val")
          .otherwise("test").as("split"),
        col("lang"), col("n_tokens"), length(col("masked")).as("masked_len"))
      .select(col("doc_id"), col("copy").cast("bigint").as("copy"),
        col("split"), col("lang"), col("n_tokens"), col("masked_len"))
  }

  def fullCuration(s: SparkSession, dir: String): DataFrame = {
    val d = docsT(s, dir)
    // stage 0 (round 18): URL-level dedup — the C4/RefinedWeb first
    // stage; drop every doc that is not its canonical URL's keep-best
    // representative (the pipe_url_dedup decision, shared helper).
    // A drop set like the others: set subtraction commutes, so it
    // composes into the same single unioned anti-join.
    val urlDrop = urlKeepBest(d).filter(!col("keep"))
      .select(col("doc_id").as("did"))
    val quality = qualityGate(d)
    // stage 2: chunk-exact drop set — canonical owner is min(doc_id)
    // of the group (min struct(doc_id, chunk_id) orders doc first)
    val chunks = SearchOps.chunkTransform(d)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_hash"))
    val chunkGroups = chunks.groupBy("chunk_hash")
      .agg(min("doc_id").as("cdoc"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val chunkDrop = chunks.join(chunkGroups, "chunk_hash")
      .filter(col("doc_id") =!= col("cdoc"))
      .select(col("doc_id").as("did"))
    // stage 3: near-dup drop set (LSH candidates, exact-verified)
    val nearDup = TextOps.minhashNearDupPairs(s, dir)
      .select(col("idb").as("did"))
    // stage 4: contamination drop set (winnow k=20/w=4 overlap with
    // the benchmark subset — includes the benchmark docs themselves)
    val fps = winnowFps(s, d)
    val benchFps = fps.filter(col("doc_id") % 97 === 0).select("fp").distinct()
    val contaminated = fps.join(benchFps, Seq("fp"), "left_semi")
      .select(col("doc_id").as("did"))
    // one unioned drop set, one anti-join; lazy localCheckpoint so the
    // four detection pipelines (URL keep-best, chunk-exact, near-dup,
    // contamination) execute exactly once at first action
    // (SchemaDriftSpec analyzes without executing — must stay lazy)
    val dropSet = urlDrop.unionByName(chunkDrop).unionByName(nearDup)
      .unionByName(contaminated)
      .distinct().localCheckpoint(eager = false)
    val surv = quality.join(dropSet, quality("doc_id") === dropSet("did"), "left_anti")
    // stages 5-6 (PII mask, mixture weights, split label) — the shared
    // stateless tail, plus the batch row's presentation sort
    curationTail(surv).orderBy("doc_id", "copy")
  }

  /** URL canonicalization CTE chain (u_urls → u_s1..u_s4 → u_c), the
    * SQL twin of [[messyUrl]] + [[canonicalizeUrl]] — `u_`-prefixed
    * so it composes with the chunk CTEs (which own the bare `c`)
    * inside the pipe_full_curation oracle; `u_drop` is the stage-0
    * drop set (every doc that is not its canonical URL's keep-best). */
  private def urlCanonCtes: String =
    """u_urls AS (
           SELECT doc_id, n_chars,
                  (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END ||
                   CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
                   CASE WHEN doc_id % 2 = 0 THEN source ELSE upper(source) END ||
                   '.example.com' ||
                   CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
                   '/docs/' ||
                   CAST(CASE WHEN (doc_id // 100) % 2 = 1 AND doc_id % 10 = 7
                             THEN doc_id - 100 ELSE doc_id END AS VARCHAR) ||
                   CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 AND doc_id % 13 = 0
                          THEN '?utm_source=feed&page=2'
                        WHEN doc_id % 11 = 0 THEN '?utm_source=feed'
                        WHEN doc_id % 13 = 0 THEN '?page=2' ELSE '' END ||
                   CASE WHEN doc_id % 17 = 0 THEN '#section-3' ELSE '' END) AS url
           FROM documents),
         u_s1 AS (SELECT doc_id, n_chars,
                         regexp_replace(url, '#.*$', '') AS nofrag
                  FROM u_urls),
         u_s2a AS (SELECT doc_id, n_chars,
                          lower(regexp_extract(nofrag,
                            '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                          lower(regexp_extract(nofrag,
                            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                          regexp_extract(nofrag,
                            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
                   FROM u_s1),
         u_s2 AS (SELECT doc_id, n_chars, scheme, rest,
                         regexp_replace(
                           CASE WHEN scheme = 'https'
                                  THEN regexp_replace(hp, ':443$', '')
                                WHEN scheme = 'http'
                                  THEN regexp_replace(hp, ':80$', '')
                                ELSE hp END,
                           '^(www\.)+', '') AS host
                  FROM u_s2a),
         u_s3 AS (SELECT doc_id, n_chars, scheme, host,
                         regexp_extract(rest, '^([^?]*)', 1) AS path0,
                         CASE WHEN contains(rest, '?')
                              THEN regexp_extract(rest, '\?(.*)$', 1)
                              ELSE '' END AS query0
                  FROM u_s2),
         u_s4 AS (SELECT doc_id, n_chars, scheme, host,
                         CASE WHEN regexp_replace(path0, '/+$', '') = ''
                                THEN '/'
                              ELSE regexp_replace(path0, '/+$', '') END AS path,
                         coalesce(array_to_string(
                           list_filter(string_split(query0, '&'),
                             x -> x <> '' AND NOT regexp_matches(x,
                               '^(utm_[^=]*|fbclid|gclid)=')), '&'), '') AS kept
                  FROM u_s3),
         u_c AS (SELECT doc_id, n_chars,
                        scheme || '://' || host || path ||
                        CASE WHEN kept = '' THEN '' ELSE '?' || kept END
                          AS canon_url
                 FROM u_s4),
         u_drop AS (
           SELECT doc_id FROM (
             SELECT doc_id, row_number() OVER (PARTITION BY canon_url
                      ORDER BY n_chars DESC, doc_id) AS rn
             FROM u_c) WHERE rn > 1)"""

  /** 3-gram Jaccard ≥ 0.8 near-dup drop-set CTEs (idx → grams →
    * sizes → inter → dups) — the exact twin of the verified MinHash
    * pair set; nested by the pipe_clean_corpus and
    * pipe_full_curation oracles. */
  private def jaccardDupsCtes: String =
    """idx AS (SELECT unnest(range(1, 1000)) AS g),
       grams AS (
         SELECT DISTINCT doc_id, substr(text, CAST(g AS INT), 3) AS gram
         FROM documents JOIN idx ON g <= greatest(length(text) - 2, 1)),
       sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       dups AS (
         SELECT DISTINCT idb AS dup_id FROM inter
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb
         WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.8)"""

  /** Winnow (k=20, w=4) fingerprint CTEs (sel → fps) — SQL twin of
    * [[winnowFps]]; nested by the pipe_decontaminate,
    * dedup_substring_pairs and pipe_full_curation oracles. */
  private def winnowFpsCtes: String =
    s"""sel AS (${winnowSelSql(20)}),
        fps AS (
          SELECT doc_id, w_h AS fp FROM sel WHERE m >= 4 AND pos <= m - 3
          UNION
          SELECT doc_id, hh FROM sel WHERE m < 4)"""

  /** Decontamination CTEs: [[winnowFpsCtes]] + the benchmark-subset
    * overlap drop set (bench → bad). */
  private def contamCtes: String =
    s"""$winnowFpsCtes,
        bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
        bad AS (SELECT DISTINCT f.doc_id FROM fps f JOIN bench b ON f.fp = b.fp)"""

  /** The `pipe_dsir_weights` SQL twin: the [[dsirWeights]] bucket
    * model, with [[graft.functions.FixedLog.log2Fixed]]'s integer
    * shift-and-square steps UNROLLED verbatim as a nest() chain over
    * the ≤ B-row bucket table (7 binary-normalization steps + 20
    * squaring/digit steps) — both engines run the identical integer
    * ops, so the lattice llr values are equal by construction, never
    * by libm luck. */
  private def dsirSql: String = {
    val B = DsirBuckets
    import OracleSql.{sb, fnvString}
    // the FixedLog chain is shared with the text_entropy oracle
    // (OracleSql.log2ChainSql, round 18) — one unrolled twin, two
    // consumers, no drift
    val chain = OracleSql.log2ChainSql("SELECT * FROM lrb")
    s"""WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents WHERE text IS NOT NULL),
        tb0 AS (SELECT doc_id, ${sb(fnvString("term"))} AS h FROM tok),
        -- MATERIALIZED: tb feeds the bucket counts AND the scoring
        -- join; plain inlining would re-run the per-token FNV fold
        tb AS MATERIALIZED (
          SELECT doc_id, ((h % $B) + $B) % $B AS bucket FROM tb0),
        bc AS (SELECT bucket, CAST(count(*) AS HUGEINT) AS cr,
                      CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS ct
               FROM tb GROUP BY 1),
        tot AS (SELECT CAST(sum(cr) AS HUGEINT) AS tr,
                       CAST(sum(ct) AS HUGEINT) AS tt FROM bc),
        lrb AS (SELECT bucket, (ct + 1) * (tr + $B) AS num,
                       (cr + 1) * (tt + $B) AS den
                FROM bc CROSS JOIN tot),
        llr AS (SELECT bucket, ${OracleSql.log2ResultExpr} AS llr
                FROM ($chain)),
        w AS (SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(llr.llr) AS BIGINT) AS log2w_num
              FROM tb JOIN llr USING (bucket) GROUP BY 1)
        SELECT doc_id, n_tokens, log2w_num,
               -- + 0.0 normalizes IEEE -0.0 (the r16 signed-zero trap:
               -- DuckDB round keeps the sign on tiny negatives, Spark's
               -- BigDecimal round has no signed zero)
               round(CAST(log2w_num AS DOUBLE) / 1048576.0, 6) + 0.0 AS log2_weight
        FROM w ORDER BY doc_id"""
  }

  def oracle: Map[String, String] = Map(
    "pipe_dsir_weights" -> dsirSql,
    "pipe_badwords_filter" ->
      """SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                len(list_filter(string_split(text, ' '),
                                x -> x IN ('slow', 'big'))) AS n_bad,
                len(list_filter(string_split(text, ' '),
                                x -> x IN ('slow', 'big'))) * 20
                  < len(string_split(text, ' ')) AS keep
         FROM documents WHERE text IS NOT NULL ORDER BY doc_id""",
    // messy-URL builder + canonicalization mirrored step-for-step from
    // messyUrl/canonicalizeUrl (trailing slashes and www. prefixes
    // strip with the same '/+$' / '^(www\.)+' regexes both engines
    // run; default-port removal is scheme-conditional in both); the
    // CTE chain is shared with pipe_full_curation's stage-0 drop set
    "pipe_url_dedup" ->
      s"""WITH $urlCanonCtes
         SELECT doc_id, canon_url,
                row_number() OVER (PARTITION BY canon_url
                                   ORDER BY n_chars DESC, doc_id) = 1 AS keep
         FROM u_c ORDER BY doc_id""",
    "pipe_clean_corpus" ->
      s"""WITH $jaccardDupsCtes
         SELECT doc_id,
                length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                lang
         FROM documents
         WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 10
           AND length(text) >= 60
           AND doc_id NOT IN (SELECT dup_id FROM dups)
         ORDER BY doc_id""",
    "ev_window_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start_s,
                event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start_s, event_type""",
    "ev_sessionize" ->
      """WITH g AS (
           SELECT event_id, user_id, ts,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
           FROM events),
         f AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS ns
           FROM g)
         SELECT event_id, user_id,
                CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
         FROM f ORDER BY user_id, event_id""",
    // the sessionize CTE chain with ts kept, grouped per session
    "ev_session_stats" ->
      """WITH g AS (
           SELECT event_id, user_id, epoch_us(ts) AS us,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
           FROM events),
         f AS (
           SELECT event_id, user_id, us,
                  CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS ns
           FROM g),
         sess AS (
           SELECT user_id, us,
                  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
                CAST(max(us) - min(us) AS BIGINT) AS duration_us
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    // per-user lead pairs, |types|^2 counts, exact ratio per row
    "ev_markov_transition" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         pr AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
           FROM e),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS ft FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n,
                round(CAST(c.n AS DOUBLE) / CAST(ft.ft AS DOUBLE), 6) AS p
         FROM c JOIN ft USING (from_type) ORDER BY from_type, to_type""",
    "ev_view_click_join" ->
      """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
         FROM events v JOIN events c
           ON c.user_id = v.user_id
          AND v.event_type = 'view' AND c.event_type = 'click'
          AND epoch_us(c.ts) > epoch_us(v.ts)
          AND epoch_us(c.ts) <= epoch_us(v.ts) + 3600000000
         ORDER BY view_id, click_id""",
    "ev_rfm" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) AS us, value
           FROM events WHERE event_type = 'purchase'),
         mx AS (SELECT max(us) AS m FROM p),
         u AS (
           SELECT user_id,
                  (mx.m - max(us)) // 86400000000 AS r_days,
                  CAST(count(*) AS BIGINT) AS n_purchases,
                  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
           FROM p CROSS JOIN mx GROUP BY user_id, mx.m),
         q AS (
           SELECT user_id, r_days, n_purchases, monetary,
                  CAST(ntile(4) OVER (ORDER BY r_days, user_id) AS INT) AS r_q,
                  CAST(ntile(4) OVER (ORDER BY n_purchases, user_id) AS INT) AS f_q,
                  CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS INT) AS m_q
           FROM u)
         SELECT user_id, r_days, n_purchases, monetary, r_q, f_q, m_q,
                r_q * 100 + f_q * 10 + m_q AS segment
         FROM q ORDER BY user_id""",
    "ev_attribution" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         conv AS (
           SELECT event_id AS conv_id, user_id, ts_us AS cts FROM ev
           WHERE event_type = 'purchase'),
         touch AS (
           SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts_us AS tts
           FROM ev WHERE event_type IN ('view', 'click')),
         cand AS (
           SELECT c.conv_id, t.touch_id, t.touch_type, t.tts
           FROM conv c JOIN touch t ON t.user_id = c.user_id
            AND t.tts < c.cts AND t.tts >= c.cts - 604800000000),
         pos AS (
           SELECT conv_id, touch_id, touch_type,
                  row_number() OVER (PARTITION BY conv_id ORDER BY tts, touch_id) AS idx,
                  count(*) OVER (PARTITION BY conv_id) AS n
           FROM cand)
         SELECT conv_id, touch_id, touch_type,
                CAST(CASE WHEN n = 1 THEN 100 WHEN n = 2 THEN 50
                     WHEN idx = 1 OR idx = n THEN 40
                     ELSE 20 // (n - 2) + CASE WHEN idx - 2 < 20 % (n - 2) THEN 1 ELSE 0 END
                END AS INT) AS credit
         FROM pos ORDER BY conv_id, touch_id""",
    "ev_asof_join" ->
      """WITH u AS (
           SELECT event_id, user_id, ts, event_type,
                  CASE WHEN event_type = 'view' THEN event_id END AS vid,
                  CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS vts
           FROM events),
         w AS (
           SELECT event_id, user_id, event_type,
                  last_value(vid IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
                  epoch_us(ts) - last_value(vts IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap_us
           FROM u)
         SELECT event_id AS click_id, user_id, view_id, gap_us
         FROM w WHERE event_type = 'click' ORDER BY click_id""",
    "ev_range_join" ->
      """SELECT p.event_id AS probe_id, count(*) AS n_events,
                CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events p JOIN events e
           ON epoch_us(e.ts) >= epoch_us(p.ts)
          AND epoch_us(e.ts) < epoch_us(p.ts) + 1800000000
         WHERE p.event_id % 200 = 0
         GROUP BY probe_id ORDER BY probe_id""",
    "ev_dedup_first" ->
      """SELECT user_id, event_type, event_id FROM (
           SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id) AS rk
           FROM events) t
         WHERE rk = 1 ORDER BY user_id, event_type""",
    "mm_features" ->
      """SELECT doc_id, strlen(text) AS n_bytes,
                len(list_distinct(string_split(text, ''))) AS n_distinct_bytes
         FROM documents ORDER BY doc_id""",
    // WAV round-trip oracle: the decoded PCM samples ARE the first 64
    // text bytes zero-padded read as 16-bit LE signed pairs, so sample
    // sum, zero crossings (strict sign-flip count, 0 counted
    // non-negative) and the byte-stream FNV compute directly from the
    // text
    "mm_wav_decode" -> {
      import OracleSql._
      s"""WITH bytes AS (
            SELECT doc_id, CAST(j AS INT) AS j,
                   CASE WHEN j < strlen(text)
                        THEN ord(substr(text, CAST(j AS INT) + 1, 1))
                        ELSE 0 END::HUGEINT AS b
            FROM documents, unnest(range(0, 64)) AS t(j)),
          samples AS (
            SELECT lo.doc_id, lo.j // 2 AS k,
                   CASE WHEN lo.b + 256 * hi.b >= 32768
                        THEN lo.b + 256 * hi.b - 65536
                        ELSE lo.b + 256 * hi.b END AS s
            FROM bytes lo JOIN bytes hi
              ON hi.doc_id = lo.doc_id AND hi.j = lo.j + 1
            WHERE lo.j % 2 = 0),
          zc AS (
            SELECT doc_id, k, s,
                   CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY k) IS NOT NULL
                         AND ((lag(s) OVER (PARTITION BY doc_id ORDER BY k) < 0) != (s < 0))
                        THEN 1 ELSE 0 END AS x
            FROM samples),
          fp AS (
            SELECT doc_id, ${fnvList("list(b ORDER BY j)")} AS f
            FROM bytes GROUP BY doc_id)
          SELECT z.doc_id, 32 AS n_samples,
                 CAST(sum(z.s) AS BIGINT) AS sample_sum,
                 CAST(sum(z.x) AS INT) AS zero_crossings,
                 ${sb("fp.f")} AS sample_fp
          FROM zc z JOIN fp ON fp.doc_id = z.doc_id
          GROUP BY z.doc_id, fp.f ORDER BY z.doc_id"""
    },

    // mm_flac_decode's oracle IS mm_wav_decode's: FLAC is lossless,
    // so the decoded PCM must equal the source samples bit-for-bit —
    // the oracle recomputes the statistics straight from the text
    // bytes and never needs to understand the container. (The
    // compensating-bug risk of a shared encode/decode is covered on
    // the spec side: FlacCodecSpec decodes an INDEPENDENTLY
    // hand-built stream.)
    //
    // ASCII-ONLY CONTRACT (ADVICE r18): the bytes CTE below extracts
    // "bytes" via character-indexed substr/ord bounded by the
    // byte-based strlen, while the engine side uses raw UTF-8
    // getBytes — the two agree ONLY while every document codepoint is
    // single-byte. The synthetic documents fixture is ASCII by
    // construction (TESTDATA.md); the same convention governs every
    // byte-extraction CTE in this file (mm_wav_decode,
    // mm_audio_resample, mm_features). A non-ASCII corpus must switch
    // these oracles to a byte-accurate extraction before trusting
    // parity.
    "mm_flac_decode" -> {
      import OracleSql._
      s"""WITH bytes AS (
            SELECT doc_id, CAST(j AS INT) AS j,
                   CASE WHEN j < strlen(text)
                        THEN ord(substr(text, CAST(j AS INT) + 1, 1))
                        ELSE 0 END::HUGEINT AS b
            FROM documents, unnest(range(0, 64)) AS t(j)),
          samples AS (
            SELECT lo.doc_id, lo.j // 2 AS k,
                   CASE WHEN lo.b + 256 * hi.b >= 32768
                        THEN lo.b + 256 * hi.b - 65536
                        ELSE lo.b + 256 * hi.b END AS s
            FROM bytes lo JOIN bytes hi
              ON hi.doc_id = lo.doc_id AND hi.j = lo.j + 1
            WHERE lo.j % 2 = 0),
          zc AS (
            SELECT doc_id, k, s,
                   CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY k) IS NOT NULL
                         AND ((lag(s) OVER (PARTITION BY doc_id ORDER BY k) < 0) != (s < 0))
                        THEN 1 ELSE 0 END AS x
            FROM samples),
          fp AS (
            SELECT doc_id, ${fnvList("list(b ORDER BY j)")} AS f
            FROM bytes GROUP BY doc_id)
          SELECT z.doc_id, 32 AS n_samples,
                 CAST(sum(z.s) AS BIGINT) AS sample_sum,
                 CAST(sum(z.x) AS INT) AS zero_crossings,
                 ${sb("fp.f")} AS sample_fp
          FROM zc z JOIN fp ON fp.doc_id = z.doc_id
          GROUP BY z.doc_id, fp.f ORDER BY z.doc_id"""
    },

    // the mm_wav_decode sample chain + the exact-rational linear
    // interpolation grid: out k sits at k·8000/12000, value =
    // (s_i·(den−rem) + s_{i+1}·rem) // den with DuckDB's TRUNCATING
    // `//` — the same semantics as the kernel's Long division
    "mm_audio_resample" -> {
      import OracleSql._
      s"""WITH bytes AS (
            SELECT doc_id, CAST(j AS INT) AS j,
                   CASE WHEN j < strlen(text)
                        THEN ord(substr(text, CAST(j AS INT) + 1, 1))
                        ELSE 0 END::HUGEINT AS b
            FROM documents, unnest(range(0, 64)) AS t(j)),
          samples AS (
            SELECT lo.doc_id, lo.j // 2 AS k,
                   CASE WHEN lo.b + 256 * hi.b >= 32768
                        THEN lo.b + 256 * hi.b - 65536
                        ELSE lo.b + 256 * hi.b END AS s
            FROM bytes lo JOIN bytes hi
              ON hi.doc_id = lo.doc_id AND hi.j = lo.j + 1
            WHERE lo.j % 2 = 0),
          grid AS (
            SELECT doc_id, CAST(k AS INT) AS k,
                   (k * 8000) // 12000 AS i, (k * 8000) % 12000 AS rem
            FROM (SELECT DISTINCT doc_id FROM samples), unnest(range(0, 47)) AS g(k)),
          rv AS (
            SELECT grid.doc_id, grid.k,
                   CASE WHEN rem = 0 THEN s0.s
                        ELSE (s0.s * (12000 - rem) + s1.s * rem) // 12000 END AS v
            FROM grid
            JOIN samples s0 ON s0.doc_id = grid.doc_id AND s0.k = grid.i
            LEFT JOIN samples s1 ON s1.doc_id = grid.doc_id AND s1.k = grid.i + 1),
          zc AS (
            SELECT doc_id, k, v,
                   CASE WHEN lag(v) OVER (PARTITION BY doc_id ORDER BY k) IS NOT NULL
                         AND ((lag(v) OVER (PARTITION BY doc_id ORDER BY k) < 0) != (v < 0))
                        THEN 1 ELSE 0 END AS x
            FROM rv),
          rb AS (
            SELECT doc_id, k * 2 + CAST(j AS INT) AS j2,
                   CASE WHEN j = 0 THEN (((v % 65536) + 65536) % 65536) % 256
                        ELSE (((v % 65536) + 65536) % 65536) // 256 END::HUGEINT AS b
            FROM rv, unnest(range(0, 2)) AS tb(j)),
          fp AS (
            SELECT doc_id, ${fnvList("list(b ORDER BY j2)")} AS f
            FROM rb GROUP BY doc_id)
          SELECT z.doc_id, 47 AS n_samples,
                 CAST(sum(z.v) AS BIGINT) AS sample_sum,
                 CAST(sum(z.x) AS INT) AS zero_crossings,
                 ${sb("fp.f")} AS sample_fp
          FROM zc z JOIN fp ON fp.doc_id = z.doc_id
          GROUP BY z.doc_id, fp.f ORDER BY z.doc_id"""
    },

    // consecutive-frame SAD recomputed from the text bytes (the
    // ord(substr)/getBytes("UTF-8") equivalence is the mm family's
    // standing ASCII-corpus contract — a non-ASCII fixture breaks
    // every row built on it, not just this one); the threshold is the
    // shared SceneCutThreshold constant
    "mm_scene_cut" ->
      s"""WITH frames AS (
           SELECT doc_id, CAST(f AS INT) AS fx, text
           FROM documents, unnest(range(0, strlen(text) // 32)) AS t(f)),
         bytes AS (
           SELECT doc_id, fx, CAST(j AS INT) AS j,
                  ord(substr(text, fx * 32 + CAST(j AS INT) + 1, 1)) AS b
           FROM frames, unnest(range(0, 32)) AS tj(j)),
         d AS (
           SELECT a.doc_id, a.fx AS frame_ix,
                  CAST(sum(abs(a.b - p.b)) AS BIGINT) AS diff
           FROM bytes a JOIN bytes p
             ON p.doc_id = a.doc_id AND p.fx = a.fx - 1 AND p.j = a.j
           GROUP BY 1, 2)
         SELECT doc_id, frame_ix, diff,
                CAST(diff >= $SceneCutThreshold AS INT) AS is_cut
         FROM d ORDER BY doc_id, frame_ix""",

    // dHash recomputed from the text bytes: bit k compares thumbnail
    // byte (k//8)*9 + k%8 against its right neighbor (zero-padded to
    // 72); u64 fold + two's-complement via the simhash sb helper; the
    // engine's banding is lossless so direct all-pairs IS the oracle
    "mm_phash_pairs" -> {
      import OracleSql._
      s"""WITH grid AS (
            SELECT doc_id, CAST(k AS INT) AS bit, text
            FROM documents, unnest(range(0, 64)) AS t(k)),
          bits AS (
            SELECT doc_id, bit,
                   CASE WHEN
                     (CASE WHEN (bit // 8) * 9 + (bit % 8) < strlen(text)
                           THEN ord(substr(text, (bit // 8) * 9 + (bit % 8) + 1, 1))
                           ELSE 0 END)
                     >
                     (CASE WHEN (bit // 8) * 9 + (bit % 8) + 1 < strlen(text)
                           THEN ord(substr(text, (bit // 8) * 9 + (bit % 8) + 2, 1))
                           ELSE 0 END)
                   THEN 1 ELSE 0 END AS v
            FROM grid),
          bitrows AS (SELECT unnest(range(0, 64)) AS bit, unnest($Pow2) AS p),
          dh AS (
            SELECT doc_id, ${sb("sum(CASE WHEN v = 1 THEN p ELSE 0::HUGEINT END)")} AS h
            FROM bits JOIN bitrows USING (bit) GROUP BY doc_id)
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
          FROM dh a JOIN dh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.h, b.h)) <= 3
          ORDER BY ida, idb"""
    },

    // per-frame dHash recomputed from the text bytes (full 72-byte
    // frames only, every compared byte in-range by construction:
    // (bit//8)*9 + bit%8 + 1 ≤ 71 < 72), kept UNSIGNED (HUGEINT) so
    // the frame-gram polynomial (h·1000003 + v mod 2^64, splitmix64
    // finalizer — u64 twins of Winnow.rollingHashesLongs) composes;
    // then the text_winnow arg_max window rule at w=2 (rightmost
    // minimum via the (2^64−1−h)·2^32+pos key), m=1 degrading to the
    // bare gram hash exactly like Winnow.winnow's hs.length<w branch,
    // and the dedup_substring_pairs fp-keyed pair join. Prototyped in
    // DuckDB against a Python replica before the Scala side (doctrine).
    "mm_video_neardup" -> {
      import OracleSql._
      val gramsNested = nest(
        """SELECT a.doc_id, a.fx AS pos, a.h AS v0, b.h AS v1
           FROM dh a JOIN dh b ON b.doc_id = a.doc_id AND b.fx = a.fx + 1""",
        Seq(uadd(umul("v0", s"${graft.functions.Winnow.Base}::HUGEINT"), "v1") -> "g1") ++
          splitmixSteps("g1", "hh"))
      val maxU = "18446744073709551615::HUGEINT"
      s"""WITH frames AS (
            SELECT doc_id, CAST(f AS INT) AS fx, text
            FROM documents, unnest(range(0, strlen(text) // $VideoFrameBytes)) AS t(f)),
          grid AS (
            SELECT doc_id, fx, CAST(k AS INT) AS bit, text
            FROM frames, unnest(range(0, 64)) AS tk(k)),
          bits AS (
            SELECT doc_id, fx, bit,
              CASE WHEN ord(substr(text, fx * $VideoFrameBytes + (bit // 8) * 9 + (bit % 8) + 1, 1))
                      > ord(substr(text, fx * $VideoFrameBytes + (bit // 8) * 9 + (bit % 8) + 2, 1))
              THEN 1 ELSE 0 END AS v
            FROM grid),
          bitrows AS (SELECT unnest(range(0, 64)) AS bit, unnest($Pow2) AS p),
          dh AS (
            SELECT doc_id, fx, sum(CASE WHEN v = 1 THEN p ELSE 0::HUGEINT END) AS h
            FROM bits JOIN bitrows USING (bit) GROUP BY doc_id, fx),
          sel AS (
            SELECT doc_id, pos, hh,
                   count(*) OVER (PARTITION BY doc_id) AS m,
                   arg_max(hh, ($maxU - hh) * 4294967296::HUGEINT + CAST(pos AS HUGEINT))
                     OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND ${VideoWinnowW - 1} FOLLOWING) AS w_h
            FROM ($gramsNested)),
          fps AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN m >= $VideoWinnowW THEN w_h ELSE hh END AS fp
            FROM sel WHERE m < $VideoWinnowW OR pos <= m - $VideoWinnowW)
          SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // pixel-verifying resize oracle (see resizePxOracleSql)
    "mm_resize" -> resizePxOracleSql,
    // the PNG path feeds the SAME pixels through PNG encode → ImageIO
    // decode → resize: lossless codec ⇒ identical pixel statistics,
    // identical oracle
    "mm_png_decode" -> resizePxOracleSql,
    "mm_gif_decode" -> resizePxOracleSql,
    // frames of 32 payload bytes, every 4th kept: frame_ix ∈ range(0,
    // strlen//32, 4); frame content pinned by byte sum + ordered FNV
    "mm_frame_sample" -> {
      import OracleSql._
      s"""WITH frames AS (
            SELECT doc_id, CAST(f AS INT) AS frame_ix, text
            FROM documents, unnest(range(0, strlen(text) // 32, 4)) AS t(f)),
          bytes AS (
            SELECT doc_id, frame_ix, CAST(j AS INT) AS j,
                   ord(substr(text, frame_ix * 32 + CAST(j AS INT) + 1, 1))::HUGEINT AS b
            FROM frames, unnest(range(0, 32)) AS tj(j))
          SELECT doc_id, frame_ix, 32 AS frame_bytes,
                 CAST(sum(b) AS BIGINT) AS frame_sum,
                 ${sb(fnvList("list(b ORDER BY j)"))} AS frame_fp
          FROM bytes GROUP BY doc_id, frame_ix ORDER BY doc_id, frame_ix"""
    },
    // SQL twin of MediaCodec.features: byte histogram → count/distinct,
    // Shannon entropy (p·ln p/ln 2, same formula; term margins to the
    // round-6 boundary are ~1e-3 × 1e-6 on this corpus, 6 orders above
    // cross-engine libm ULP drift), FNV-1a fold over the ORDERED
    // 256-bin histogram (zero bins included, exactly like the kernel)
    "mm_features_full" -> {
      import OracleSql._
      s"""WITH chars AS (
            SELECT doc_id, ord(c) AS b
            FROM documents, unnest(string_split(text,'')) AS t(c)),
          hist AS (SELECT doc_id, b, count(*) AS c FROM chars GROUP BY 1, 2),
          full_hist AS (
            SELECT d.doc_id, r.b, coalesce(h.c, 0)::HUGEINT AS c
            FROM (SELECT doc_id FROM documents) d
            CROSS JOIN (SELECT unnest(range(0,256)) AS b) r
            LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = r.b),
          fp AS (
            SELECT doc_id, ${fnvList("list(c ORDER BY b)")} AS f
            FROM full_hist GROUP BY doc_id),
          ent AS (
            SELECT doc_id,
                   CAST(count(*) AS INT) AS n_distinct_bytes,
                   -sum((CAST(c AS DOUBLE) / n) * (ln(CAST(c AS DOUBLE) / n) / ln(2.0))) AS entropy
            FROM (SELECT h.doc_id, h.b, h.c, CAST(strlen(d.text) AS DOUBLE) AS n
                  FROM hist h JOIN documents d USING (doc_id)) GROUP BY doc_id)
          SELECT d.doc_id, strlen(d.text) AS n_bytes, e.n_distinct_bytes,
                 round(e.entropy, 6) AS entropy, ${sb("fp.f")} AS fingerprint
          FROM documents d
          JOIN ent e ON e.doc_id = d.doc_id
          JOIN fp ON fp.doc_id = d.doc_id
          ORDER BY d.doc_id"""
    },
    // SQL twin of Winnow.fingerprints (k=5, w=4): 5-gram polynomial
    // hash (base 1000003, u64) + splitmix64 finalizer per position,
    // then per window of 4 the minimum hash with rightmost-tie rule —
    // encoded as arg_max over the key (2^64-1-h)·2^32 + pos, so larger
    // key = smaller hash, ties broken toward larger pos.
    "text_winnow" ->
      s"""WITH sel AS (${winnowSelSql(5)})
          SELECT doc_id,
            CASE WHEN any_value(m) >= 4
                 THEN CAST(count(DISTINCT w_h) FILTER (pos <= m - 3) AS INT)
                 ELSE CAST(count(DISTINCT hh) AS INT) END AS n_fingerprints,
            CASE WHEN any_value(m) >= 4
                 THEN min(${OracleSql.sb("w_h")}) FILTER (pos <= m - 3)
                 ELSE min(${OracleSql.sb("hh")}) END AS min_fp
          FROM sel GROUP BY doc_id ORDER BY doc_id""",

    // image round-trip oracle: the decoded 8x8 PGM pixels ARE the first
    // 64 text bytes zero-padded, so the statistics compute directly
    // from the text — same hist/entropy/FNV machinery as
    // mm_features_full, over substr(text,1,64) plus the padding zeros
    "mm_image_roundtrip" -> {
      import OracleSql._
      s"""WITH chars AS (
            SELECT doc_id, ord(c) AS b
            FROM (SELECT doc_id, substr(text, 1, 64) AS t64 FROM documents),
                 unnest(string_split(t64, '')) AS t(c)
            UNION ALL
            SELECT doc_id, 0 AS b
            FROM documents, unnest(range(0, greatest(64 - strlen(text), 0)))),
          hist AS (SELECT doc_id, b, count(*) AS c FROM chars GROUP BY 1, 2),
          full_hist AS (
            SELECT d.doc_id, r.b, coalesce(h.c, 0)::HUGEINT AS c
            FROM (SELECT doc_id FROM documents) d
            CROSS JOIN (SELECT unnest(range(0,256)) AS b) r
            LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = r.b),
          fp AS (
            SELECT doc_id, ${fnvList("list(c ORDER BY b)")} AS f
            FROM full_hist GROUP BY doc_id),
          ent AS (
            SELECT doc_id,
                   CAST(count(*) AS INT) AS n_distinct_bytes,
                   -sum((CAST(c AS DOUBLE) / 64) * (ln(CAST(c AS DOUBLE) / 64) / ln(2.0))) AS entropy
            FROM hist GROUP BY doc_id)
          SELECT d.doc_id, 64 AS n_bytes, e.n_distinct_bytes,
                 round(e.entropy, 6) AS entropy, ${sb("fp.f")} AS fingerprint
          FROM documents d
          JOIN ent e ON e.doc_id = d.doc_id
          JOIN fp ON fp.doc_id = d.doc_id
          ORDER BY d.doc_id"""
    },

    // decontamination oracle: same winnow hash table; a doc's
    // fingerprint SET is the window minima (or all hashes when no
    // window exists), docs sharing any fingerprint with the benchmark
    // subset are excluded
    "pipe_decontaminate" ->
      s"""WITH $contamCtes
          SELECT doc_id, lang FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id""",

    "ev_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
          f AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
          a AS (SELECT DISTINCT e.user_id, f.d0, e.d - f.d0 AS off
                FROM e JOIN f ON e.user_id = f.user_id)
          SELECT d0 AS cohort_day, off AS day_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM a GROUP BY 1, 2 ORDER BY 1, 2""",

    // nested min-after-min funnel CTEs; strict > on µs steps
    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
          v AS (SELECT user_id, MIN(tu) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, MIN(tu) AS t2
                FROM e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.tu > v.t1 GROUP BY e.user_id),
          p AS (SELECT e.user_id, MIN(tu) AS t3
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.tu > c.t2 GROUP BY e.user_id)
          SELECT u.user_id,
                 CASE WHEN p.t3 IS NOT NULL THEN 3
                      WHEN c.t2 IS NOT NULL THEN 2
                      WHEN v.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
                 v.t1 AS t1_us, c.t2 AS t2_us, p.t3 AS t3_us
          FROM (SELECT DISTINCT user_id FROM e) u
          LEFT JOIN v USING (user_id)
          LEFT JOIN c USING (user_id)
          LEFT JOIN p USING (user_id)
          ORDER BY user_id""",

    // same winnow fingerprint table as pipe_decontaminate (UNION
    // dedups to distinct (doc, fp)), then the fp-keyed pair join
    "dedup_substring_pairs" ->
      s"""WITH $winnowFpsCtes
          SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""",

    // the same per-position raw-gram diagonal-run machinery as the
    // engine (equi-join on the 20-char substring itself — verbatim by
    // construction), gaps-and-islands twice: consecutive positions →
    // runs, then overlapping spans → merged intervals; clean text via
    // ordered piece concatenation (prototyped against a Python
    // replica before the Scala side was written — round-16 doctrine)
    "pipe_remove_dup_spans" ->
      s"""WITH g AS (
            SELECT doc_id, CAST(i AS INT) AS pos,
                   substr(text, CAST(i AS INT), $DupSpanGram) AS gram
            FROM documents, unnest(range(1, 1000)) AS t(i)
            WHERE i <= strlen(text) - ${DupSpanGram - 1}),
          mt AS (
            SELECT b.doc_id AS idb, b.pos AS pb, a.doc_id AS ida,
                   b.pos - a.pos AS dg
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
          runs AS (
            SELECT idb, ida, dg, pb,
                   pb - row_number() OVER (PARTITION BY idb, ida, dg ORDER BY pb) AS isl
            FROM mt),
          spans AS (
            SELECT idb, CAST(min(pb) AS INT) AS s,
                   CAST(max(pb) + ${DupSpanGram - 1} AS INT) AS e
            FROM runs GROUP BY idb, ida, dg, isl
            HAVING count(*) >= ${DupSpanMinChars - DupSpanGram + 1}),
          iv0 AS (SELECT DISTINCT idb, s, e FROM spans),
          m1 AS (
            SELECT idb, s, e,
                   max(e) OVER (PARTITION BY idb ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM iv0),
          m2 AS (SELECT idb, s, e,
                        CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END AS brk
                 FROM m1),
          m3 AS (SELECT idb, s, e,
                        SUM(brk) OVER (PARTITION BY idb ORDER BY s, e
                                       ROWS UNBOUNDED PRECEDING) AS grp
                 FROM m2),
          iv AS (SELECT idb, grp, MIN(s) AS s, MAX(e) AS e FROM m3 GROUP BY 1, 2),
          istats AS (SELECT idb, CAST(count(*) AS BIGINT) AS n_spans,
                            CAST(sum(e - s + 1) AS BIGINT) AS n_chars_removed,
                            max(e) AS last_e
                     FROM iv GROUP BY idb),
          seg AS (SELECT idb, s, e,
                         COALESCE(lag(e) OVER (PARTITION BY idb ORDER BY s), 0) AS pe
                  FROM iv),
          pieces AS (
            SELECT seg.idb, seg.s AS o,
                   substr(d.text, seg.pe + 1, seg.s - seg.pe - 1) AS piece
            FROM seg JOIN documents d ON d.doc_id = seg.idb
            UNION ALL
            SELECT st.idb, 2147483647, substr(d.text, CAST(st.last_e + 1 AS INT))
            FROM istats st JOIN documents d ON d.doc_id = st.idb),
          cleant AS (SELECT idb, string_agg(piece, '' ORDER BY o) AS clean_text
                     FROM pieces GROUP BY idb)
          SELECT d.doc_id, COALESCE(st.n_spans, 0) AS n_spans,
                 COALESCE(st.n_chars_removed, 0) AS n_chars_removed,
                 COALESCE(c.clean_text, d.text) AS clean_text
          FROM documents d
          LEFT JOIN istats st ON st.idb = d.doc_id
          LEFT JOIN cleant c ON c.idb = d.doc_id
          ORDER BY d.doc_id""",

    // the six per-stage oracles composed verbatim: the three drop-set
    // CTE families (3-gram jaccard dups / chunk-hash canon / winnow
    // contamination) subtracted from the quality gate, then the mask/
    // mix/split expressions from their standalone rows. MATERIALIZED
    // on the heavy detection CTEs (the PQ-oracle lesson)
    "pipe_full_curation" ->
      raw"""WITH $urlCanonCtes,
          $jaccardDupsCtes,
          ${SearchOps.chunkCtes},
          ch AS (SELECT md5(chunk) AS chunk_hash, doc_id FROM c),
          cg AS (SELECT chunk_hash, min(doc_id) AS cdoc, count(*) AS n
                 FROM ch GROUP BY 1),
          cdrop AS MATERIALIZED (
            SELECT DISTINCT ch.doc_id FROM ch JOIN cg USING (chunk_hash)
            WHERE cg.n > 1 AND ch.doc_id <> cg.cdoc),
          $contamCtes,
          surv AS (
            SELECT doc_id, text, lang, source,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents
            WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 10
              AND length(text) >= 60
              AND doc_id NOT IN (SELECT doc_id FROM u_drop)
              AND doc_id NOT IN (SELECT dup_id FROM dups)
              AND doc_id NOT IN (SELECT doc_id FROM cdrop)
              AND doc_id NOT IN (SELECT doc_id FROM bad)),
          mk AS (
            SELECT doc_id, lang, source, n_tokens,
                   regexp_replace(regexp_replace(
                     text || ' reach user' || CAST(doc_id AS VARCHAR) ||
                     '@mail.example or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                     '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked
            FROM surv),
          rp AS (
            SELECT doc_id, lang, n_tokens, length(masked) AS masked_len,
                   ((CAST(substr(source, 4) AS INT) % 4) * 75 + 50) // 100 +
                   CASE WHEN (doc_id * 48271) % 65536 % 100 <
                             ((CAST(substr(source, 4) AS INT) % 4) * 75 + 50) % 100
                        THEN 1 ELSE 0 END AS reps
            FROM mk)
          SELECT doc_id, CAST(u.c AS BIGINT) AS copy,
                 CASE WHEN (doc_id * 48271) % 65536 % 100 < 90 THEN 'train'
                      WHEN (doc_id * 48271) % 65536 % 100 < 95 THEN 'val'
                      ELSE 'test' END AS split,
                 lang, n_tokens, masked_len
          FROM rp, unnest(range(1, reps + 1)) AS u(c)
          WHERE reps >= 1
          ORDER BY doc_id, copy""",

    // same contact derivation, RE2 'g' replace; patterns live in the
    // Java-regex ∩ RE2 common subset (char classes + bounded repeats,
    // no backrefs/lookarounds), so both engines match identical spans
    "pipe_pii_mask" ->
      raw"""WITH w AS (
            SELECT doc_id,
                   text || ' reach user' || CAST(doc_id AS VARCHAR) ||
                   '@mail.example or +1-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact
            FROM documents)
          SELECT doc_id,
                 regexp_replace(regexp_replace(contact,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked,
                 CAST(len(regexp_extract_all(contact,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
                 CAST(len(regexp_extract_all(contact,
                   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones
          FROM w ORDER BY doc_id""",

    "ev_locf_resample" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS tu, value, event_id FROM events),
         span AS (
           SELECT user_id, min(tu) // 3600000000 + 1 AS h0,
                  max(tu) // 3600000000 AS h1
           FROM e GROUP BY user_id),
         grid AS (
           SELECT user_id, unnest(range(h0, h1 + 1)) AS h
           FROM span WHERE h1 >= h0),
         u AS (
           SELECT user_id, tu, 0 AS is_grid, event_id, value,
                  CAST(NULL AS BIGINT) AS h
           FROM e
           UNION ALL
           SELECT user_id, h * 3600000000, 1, 9223372036854775807,
                  CAST(NULL AS DOUBLE), h
           FROM grid),
         w AS (
           SELECT user_id, h, is_grid,
                  last_value(value IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY tu, is_grid, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
           FROM u)
         SELECT user_id, h AS hour_bucket, v AS value
         FROM w WHERE is_grid = 1 ORDER BY user_id, hour_bucket""",

    "ev_sliding_agg" ->
      """WITH e AS (SELECT epoch_us(ts) AS tu, event_type FROM events),
         w AS (
           SELECT ((tu // 900000000) - i.i) * 900000000 AS ws, event_type, tu
           FROM e, (SELECT unnest(range(0, 4)) AS i) i),
         f AS (SELECT ws, event_type FROM w
               WHERE ws >= 0 AND tu < ws + 3600000000)
         SELECT ws // 1000000 AS window_start_s, event_type,
                count(*) AS n
         FROM f GROUP BY 1, 2 ORDER BY window_start_s, event_type""",

    "ev_anomaly" ->
      """SELECT event_id, event_type, value FROM (
           SELECT event_id, event_type, value,
                  percent_rank() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS pr
           FROM events) t
         WHERE pr >= 0.99 ORDER BY event_id""",

    "ev_top_paths" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id, epoch_us(ts) AS tu
           FROM events),
         tri AS (
           SELECT event_type || '>' ||
                  lead(event_type, 1) OVER (PARTITION BY user_id
                                            ORDER BY tu, event_id) || '>' ||
                  lead(event_type, 2) OVER (PARTITION BY user_id
                                            ORDER BY tu, event_id) AS path,
                  lead(event_type, 2) OVER (PARTITION BY user_id
                                            ORDER BY tu, event_id) AS e3
           FROM e)
         SELECT path, count(*) AS n FROM tri WHERE e3 IS NOT NULL
         GROUP BY path ORDER BY n DESC, path LIMIT 25"""
  )

  /** Pixel-verifying resize oracle shared by mm_resize and
    * mm_png_decode: the 7x9 source pixel grid IS the first 63 text
    * bytes zero-padded (row-major), and nearest-neighbor 7x9 → 5x4
    * maps resized (x, y) to source index ((y*9)//4)*7 + (x*7)//5 — so
    * the resized-pixel byte sum and the order-sensitive FNV-1a fold
    * compute directly from the text. Any stride/padding/flip/rounding
    * defect in either codec chain changes px_fp. */
  private def resizePxOracleSql: String = {
    import OracleSql._
    s"""WITH px AS (
          SELECT doc_id, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
                 CAST(((y * 9) // 4) * 7 + (x * 7) // 5 AS INT) AS src
          FROM documents,
               unnest(range(0, 4)) AS ty(y), unnest(range(0, 5)) AS tx(x)),
        vals AS (
          SELECT p.doc_id, p.y, p.x,
                 CASE WHEN p.src < strlen(d.text)
                      THEN ord(substr(d.text, p.src + 1, 1))
                      ELSE 0 END::HUGEINT AS b
          FROM px p JOIN documents d USING (doc_id))
        SELECT doc_id, CAST(sum(b) AS BIGINT) AS px_sum,
               ${sb(fnvList("list(b ORDER BY y * 5 + x)"))} AS px_fp
        FROM vals GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Per-position winnow hash table (doc_id, pos, m, hh, w_h) — the
    * SQL twin of Winnow.fingerprints(k, w=4): k-gram polynomial hash
    * (base 1000003, u64) + splitmix64 finalizer per position, then per
    * window of 4 the minimum hash with rightmost-tie rule, encoded as
    * arg_max over the key (2^64-1-h)·2^32 + pos. Shared by the
    * text_winnow (k=5) and pipe_decontaminate (k=20) oracles. */
  private def winnowSelSql(k: Int): String = {
    import OracleSql._
    val grams =
      s"""SELECT doc_id, CAST(g AS INT) AS pos, substr(text, CAST(g AS INT), $k) AS gram,
                length(text) - ${k - 1} AS m
         FROM documents, unnest(range(1, greatest(length(text) - ${k - 2}, 2))) AS t(g)"""
    val steps =
      Seq("ord(substr(gram,1,1))::HUGEINT" -> "h1") ++
        (2 to k).map(i =>
          uadd(umul(s"h${i - 1}", "1000003::HUGEINT"), s"ord(substr(gram,$i,1))::HUGEINT") -> s"h$i") ++
        splitmixSteps(s"h$k", "hh")
    val hashed = nest(grams, steps)
    val maxU = "18446744073709551615::HUGEINT"
    s"""SELECT doc_id, pos, m, hh,
               arg_max(hh, ($maxU - hh) * 4294967296::HUGEINT + CAST(pos AS HUGEINT))
                 OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS w_h
        FROM ($hashed)"""
  }
}
