package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming-capable event transforms. The reference is
  * strictly batch (SURVEY §2.9); this module adds the streaming surface
  * a large-scale pipeline needs: the same logical transform runs over a
  * batch DataFrame (for the DuckDB oracle) and a readStream source
  * (proven in EventsStreamSpec with a memory sink).
  *
  * All event-time arithmetic is µs-domain via [[EventTime.tsUs]] —
  * `ts` may arrive as ns BIGINT or TIMESTAMP(_NTZ) (schema drift armor).
  */
object EventsStream {

  /** Tumbling 1-hour windowed aggregation — watermark + window on the
    * event time; in batch mode the watermark is a no-op and results
    * match the oracle's epoch-bucket arithmetic exactly. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(EventTime.tsUs(events)))
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_seconds(col("w.start")).as("window_start_s"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour / 15-minute windowed aggregation — the sliding
    * sibling of [[windowedCounts]]: Spark's window() emits each event
    * into its 4 covering windows; the watermark bounds state to the
    * slide horizon. Matches `ev_sliding_agg`'s integer-bucket batch
    * form on counts (the batch query IS the oracle twin). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(EventTime.tsUs(events)))
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window(col("ts_ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("w.start")).as("window_start_s"),
        col("event_type"), col("n"))
      // the batch twin drops pre-epoch window starts (ws >= 0); without
      // this, near-epoch events would emit up to 3 negative-start
      // windows the query never produces and parity would break
      .filter(col("window_start_s") >= 0)

  /** Streaming sessionization with explicit state: per-user session
    * counter + last-event time carried in GroupState, the stateful
    * counterpart of [[sessionize]] (same gap rule).
    *
    * KEY-POPULATION bound (VERDICT r15 #2, completing the r14
    * doctrine): a key idle past `idleEvictUs` (default 7 days) is
    * REMOVED by event-time timeout. Like pathsStream — and unlike
    * attributionStream's identity-preserving eviction — this is a
    * DOCUMENTED SEMANTIC CHOICE: the state carries the user's session
    * COUNTER, so a user returning after eviction restarts numbering
    * at session 0 where the batch twin would continue counting. The
    * horizon is far past the 30-minute gap rule (any post-eviction
    * event would have opened a NEW session anyway — only the
    * session_id VALUE can differ, never the boundary), and batch
    * parity holds exactly while no user idles past the horizon
    * (fixture max intra-user gap ~4 days; MicroBatchSplitSpec stays
    * green with eviction armed, StateEvictionSpec pins the store
    * shrinking). `idleEvictUs <= 0` disables eviction — no watermark
    * at all, arbitrarily late rows reach the per-user straggler rule.
    * When armed, the watermark DELAY equals the idle horizon in
    * MICROSECONDS (the engine's pre-state late filter then only drops
    * what the horizon already declared dead — the shared watermark
    * delay rule, review r15). */
  final case class SessionState(lastTsUs: Long, sessionId: Long)
  final case class SessionOut(event_id: Long, user_id: Long, session_id: Long)

  def sessionizeStream(spark: SparkSession, events: DataFrame,
      idleEvictUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 30L * 60 * 1000000L
    // eviction is a streaming-execution concern: batch-mode
    // flatMapGroupsWithState sees each group exactly once and discards
    // state afterwards (a timeout can never fire) and has NO watermark
    // for getCurrentWatermarkMs to read — arming EventTimeTimeout
    // there threw on the batch-consumption contract EventTimeSpec pins
    val evict = idleEvictUs > 0 && events.isStreaming
    val timeoutConf =
      if (evict) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val selected = events.select(col("event_id"), col("user_id"),
      EventTime.tsUs(events).as("ts_us"),
      timestamp_micros(EventTime.tsUs(events)).as("ts_ts"))
    val marked =
      if (evict) selected.withWatermark("ts_ts", s"$idleEvictUs microseconds")
      else selected
    marked
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (_: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // nothing is buffered per key (each event's session id was
            // emitted on arrival), so gap-expiry eviction is a plain
            // remove — the "flush" is vacuous by construction
            state.remove()
            Iterator.empty
          } else {
          // events within a micro-batch arrive unordered: sort by (ts, id).
          // Events OLDER than the committed state (stragglers from an
          // earlier micro-batch) are dropped — processing them would
          // regress lastTs and corrupt later session boundaries; the
          // batch twin `sessionize` over complete data is the reference.
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, -1L))
          val out = evs.flatMap { case (eid, uid, ts, _) =>
            if (st.lastTsUs != Long.MinValue && ts < st.lastTsUs) None // late straggler
            else {
              val sid = if (st.lastTsUs == Long.MinValue || ts - st.lastTsUs > gapUs)
                st.sessionId + 1 else st.sessionId
              st = SessionState(ts, sid)
              Some(SessionOut(eid, uid, sid))
            }
          }
          state.update(st)
          if (evict)
            state.setTimeoutTimestamp(
              math.max(st.lastTsUs / 1000L + idleEvictUs / 1000L,
                state.getCurrentWatermarkMs()) + 1L)
          out.iterator
          }
      }
      .toDF("event_id", "user_id", "session_id")
  }

  /** Streaming exact dedup on (user_id, event_type) — dedup-on-ingest,
    * the streaming form of the batch `dedup_exact_hash`/`ev_dedup_first`
    * operators. State-store keyed dedup with watermark-bounded state
    * eviction (`dropDuplicatesWithinWatermark`), so state stays bounded
    * on an unbounded stream — plain `dropDuplicates` would grow state
    * forever at 100 TB/day ingest. Emits the first *arrival* per key;
    * arrival order across partitions is nondeterministic, so the batch
    * twin defines first by event time and the spec checks key-set
    * equality + membership rather than exact row identity.
    *
    * State-boundedness claim, made explicit (VERDICT r15 #2): the
    * seen-key set is WATERMARK-SCOPED by the engine — a key whose
    * last sighting is older than the watermark is dropped from the
    * store, which is sound because any admissible future row (the
    * watermark filter rejects older ones) either carries a fresh
    * event time, re-arming the key, or would have been dropped
    * anyway; a key seen only before the horizon can never dedup an
    * admissible event. The trade is the documented
    * within-watermark semantics: a duplicate arriving more than the
    * delay after its original is re-emitted (at-least-once across
    * the horizon, exact inside it). StateEvictionSpec pins the store
    * actually shrinking once the watermark passes idle keys. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(EventTime.tsUs(events)))
      .withWatermark("ts_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("event_id", "user_id", "event_type")

  /** Stream-stream interval join: pair each user's 'view' event with
    * the 'click' events that follow it within one hour — the
    * impression→conversion enrichment shape. Both sides carry
    * watermarks and the join condition bounds event time on both
    * sides, so Spark can evict join state (unbounded state otherwise).
    * In batch mode the same plan is a plain range join (oracle:
    * ev_view_click_join). */
  def viewClickJoin(events: DataFrame): DataFrame = {
    val base = events
      .withColumn("ts_us", EventTime.tsUs(events))
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
    val views = base.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts_us").as("view_us"), col("ts_ts").as("view_time"))
      .withWatermark("view_time", "10 minutes")
    val clicks = base.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts_us").as("click_us"), col("ts_ts").as("click_time"))
      .withWatermark("click_time", "10 minutes")
    // membership is decided by the exact µs bounds; the time-column
    // bounds are a (non-strict) superset, present so the stream
    // planner can evict join state on both sides
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_time") >= col("view_time") &&
        col("click_time") <= col("view_time") + expr("INTERVAL 1 HOUR") &&
        col("click_us") > col("view_us") &&
        col("click_us") <= col("view_us") + lit(3600L * 1000000L))
      .select("view_id", "click_id", "user_id")
  }

  /** Streaming as-of join: the stateful twin of the batch
    * `ev_asof_join` operator — each click is paired with the user's
    * latest view at-or-before it. Per-user GroupState carries only
    * (last event ts, latest view id, latest view ts): O(1) state per
    * user regardless of stream length, versus the unbounded two-sided
    * buffer a stream-stream join would need for an unbounded "any
    * prior view" lookback. Same straggler rule as [[sessionizeStream]]:
    * events older than the committed state are dropped (a late view
    * cannot retroactively re-answer an already-emitted click); the
    * batch twin over complete data is the reference semantics.
    *
    * NO idle-key eviction, deliberately (the retentionStream
    * carve-out, VERDICT r15 #2): the as-of lookback is SEMANTICALLY
    * UNBOUNDED — a click may pair with a view arbitrarily far in the
    * past, so the per-user (viewId, viewTs) IS live state forever;
    * evicting an idle user and seeing a later click would answer
    * "no prior view" where batch answers with the old view. Content
    * per key is O(1); the key population is the price of the
    * unbounded-lookback semantics. A deployment wanting bounded keys
    * should change the OPERATOR contract to a horizon'd as-of
    * (pair only within N days) — then the attribution eviction proof
    * applies verbatim. */
  final case class AsofState(lastTsUs: Long, viewId: Long, viewTsUs: Long)
  final case class AsofOut(click_id: Long, user_id: Long,
      view_id: Option[Long], gap_us: Option[Long])

  def asofStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val NoView = Long.MinValue
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[AsofState]) =>
          // micro-batch arrival order is nondeterministic: sort by the
          // batch twin's (ts, event_id) order — a view at the same ts
          // as a click but a smaller id precedes it, exactly as batch
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(AsofState(Long.MinValue, NoView, 0L))
          val out = evs.flatMap { case (eid, uid, ts, typ) =>
            if (st.lastTsUs != Long.MinValue && ts < st.lastTsUs) None // late straggler
            else {
              st = st.copy(lastTsUs = ts)
              typ match {
                case "view" =>
                  st = st.copy(viewId = eid, viewTsUs = ts); None
                case "click" =>
                  val hit = st.viewId != NoView
                  Some(AsofOut(eid, uid,
                    if (hit) Some(st.viewId) else None,
                    if (hit) Some(ts - st.viewTsUs) else None))
                case _ => None
              }
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF("click_id", "user_id", "view_id", "gap_us")
  }

  /** Stateful streaming twin of `ev_funnel`: per-user GroupState holds
    * (last event ts, t1, t2, t3) — O(1) per user — and a row is
    * emitted each time the user ADVANCES a stage. The union of
    * advancement rows over the whole stream equals the batch funnel
    * unrolled: batch stage ≥ k with timestamp t_k ⟺ exactly one
    * (user, k, t_k) advancement, because the batch walk is the same
    * greedy first-qualifying scan in (ts, event_id) order. Straggler
    * rule shared with the other twins: events strictly older than the
    * committed state are dropped.
    *
    * NO idle-key eviction, deliberately (the retentionStream/asof
    * carve-out, VERDICT r15 #2): funnel stages have SEMANTICALLY
    * UNBOUNDED lookback — a purchase years after the click still
    * advances stage 3, and the (t1, t2, t3) progress is the user's
    * identity in this query; evicting an idle mid-funnel user would
    * re-run stage 1 on their return and emit advancement rows the
    * batch funnel never contains. 32 bytes per user is the price of
    * the semantics; a bounded variant is a different operator (a
    * windowed funnel), not an optimization of this one. */
  final case class FunnelState(lastTsUs: Long, t1: Long, t2: Long, t3: Long)
  final case class FunnelOut(user_id: Long, stage: Int, t_us: Long)

  def funnelStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[FunnelState]) =>
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(
            FunnelState(Long.MinValue, -1L, -1L, -1L))
          val out = evs.flatMap { case (_, _, ts, typ) =>
            if (st.lastTsUs != Long.MinValue && ts < st.lastTsUs) None // late straggler
            else {
              st = st.copy(lastTsUs = ts)
              typ match {
                case "view" if st.t1 < 0 =>
                  st = st.copy(t1 = ts); Some(FunnelOut(user, 1, ts))
                case "click" if st.t2 < 0 && st.t1 >= 0 && ts > st.t1 =>
                  st = st.copy(t2 = ts); Some(FunnelOut(user, 2, ts))
                case "purchase" if st.t3 < 0 && st.t2 >= 0 && ts > st.t2 =>
                  st = st.copy(t3 = ts); Some(FunnelOut(user, 3, ts))
                case _ => None
              }
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF("user_id", "stage", "t_us")
  }

  /** Stateful streaming twin of `ev_top_paths`' trigram stage: per-user
    * GroupState holds the last TWO event types plus the (ts, event_id)
    * high-water mark — O(1) per user — and each arriving event closes
    * one 3-event path. The union of emitted trigrams over the whole
    * stream equals the batch twin's two-lead window output, because
    * both walk the same (ts_us, event_id) order. Stragglers use the
    * LEXICOGRAPHIC (ts, event_id) rule (stricter than the other twins'
    * ts-only rule): path formation is order-sensitive even among
    * equal-µs ties, so an equal-ts event with a smaller id than the
    * committed mark would re-order history and is dropped. The global
    * top-k aggregation happens downstream of this append stream.
    *
    * KEY-POPULATION bound (VERDICT r14 #2): a key idle past
    * `idleEvictUs` (default 7 days) is REMOVED by event-time timeout.
    * Unlike attributionStream's eviction this one is a DOCUMENTED
    * SEMANTIC CHOICE, not an identity: the carried (t1, t2) pair dies
    * with the state, so a trigram never spans an idle gap longer than
    * the horizon — the session-scoped reading of path analysis.
    * Batch parity is BOUNDED-DISORDER CONDITIONAL, not unconditional
    * (ADVICE r15/VERDICT r16 #5b): it holds while no user idles past
    * the horizon AND cross-user event-time disorder stays within it —
    * the armed watermark is GLOBAL, so a row arriving more than the
    * horizon behind the stream's maximum event time is dropped by the
    * engine's late filter even when ITS user never idled (the
    * per-user straggler rule would have absorbed it). The fixture's
    * max intra-user gap is ~4 days and its disorder is micro-batch-
    * bounded; MicroBatchSplitSpec stays green with eviction armed,
    * and StateEvictionSpec pins the store shrinking. `idleEvictUs <= 0`
    * disables eviction — no watermark is attached at all, so
    * arbitrarily late rows reach the per-user straggler rule
    * (strictly CLOSER to batch parity than r14's unconditional
    * 10-minute late filter, not identical to it).
    * When armed, the watermark DELAY equals the idle horizon so the
    * engine's late-input filter can only drop what the horizon
    * already declared dead (review r15 — a short fixed delay would
    * silently drop cross-user disorder the per-user straggler rule
    * used to absorb). */
  final case class PathState(lastTsUs: Long, lastId: Long, t1: String, t2: String)
  final case class PathOut(user_id: Long, path: String, ts_us: Long, event_id: Long)

  def pathsStream(spark: SparkSession, events: DataFrame,
      idleEvictUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // streaming-only arming — same rationale as sessionizeStream's
    // `evict`: batch execution has no watermark and no timeouts
    val evict = idleEvictUs > 0 && events.isStreaming
    val timeoutConf =
      if (evict) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val selected = events.select(col("event_id"), col("user_id"),
      EventTime.tsUs(events).as("ts_us"), col("event_type"),
      timestamp_micros(EventTime.tsUs(events)).as("ts_ts"))
    val marked =
      if (evict)
        // microseconds, NOT a seconds truncation: a fractional-second
        // horizon would otherwise get a STRICTER late filter than the
        // horizon itself declares dead (review r15 pass 2)
        selected.withWatermark("ts_ts", s"$idleEvictUs microseconds")
      else selected
    marked
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (user: Long, it: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
            state: GroupState[PathState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(
            PathState(Long.MinValue, Long.MinValue, null, null))
          val out = evs.flatMap { case (eid, _, ts, typ, _) =>
            // drop (ts, id) <= committed mark: strictly-older events
            // AND exact redeliveries of the newest event — an
            // at-least-once duplicate of (lastTs, lastId) would
            // otherwise fabricate a bogus `...>X>X` trigram and
            // corrupt the carried pair
            if (ts < st.lastTsUs ||
                (ts == st.lastTsUs && eid <= st.lastId)) None
            else {
              val emit =
                if (st.t1 != null && st.t2 != null)
                  Some(PathOut(user, s"${st.t1}>${st.t2}>$typ", ts, eid))
                else None
              st = PathState(ts, eid, st.t2, typ)
              emit
            }
          }
          state.update(st)
          if (evict)
            state.setTimeoutTimestamp(
              math.max(st.lastTsUs / 1000L + idleEvictUs / 1000L,
                state.getCurrentWatermarkMs()) + 1L)
          out.iterator
          }
      }
      .toDF("user_id", "path", "ts_us", "event_id")
  }

  /** Stateful streaming twin of `ev_retention`'s per-user stage: state
    * is the user's cohort day plus a 64-day BITMASK of offsets already
    * emitted — a fixed 16 bytes per user, the production-shaped bounded
    * retention horizon (the batch twin has no horizon; parity holds for
    * offsets < 64, and the horizon is the documented difference). Each
    * first activity on a new offset day emits one (user, cohort_day,
    * day_offset) row; grouping those by (cohort, offset) downstream
    * reproduces the batch cohort table. Stragglers older than the
    * committed high-water mark are dropped (shared ts-only rule — day
    * attribution only needs the µs timestamp, and an equal-ts replay
    * cannot change an already-set bit).
    *
    * NO idle-key eviction, deliberately (VERDICT r14 #2 carve-out):
    * the state's cohort_day is the user's IDENTITY here — evicting an
    * idle user and seeing them return would re-cohort them at the
    * return day and emit a row the batch table never contains (a
    * false "new user"), unlike attribution/paths where an evicted
    * key's future output is respectively identical / documented-
    * session-scoped. Retention state must live as long as returns
    * matter; its 16 bytes/user is the price of cohort identity, and
    * the 64-day emission horizon bounds per-key OUTPUT, not the
    * key's lifetime. */
  /** Streaming DDSketch quantiles — percentiles-on-ingest, the
    * monitoring form of [[graft.operators.QuantileSketch]]. One
    * GroupState per event_type holds the bucket histogram (size
    * logarithmic in the value range, independent of stream length);
    * each micro-batch folds its values in and re-emits the current
    * p50/p95 stamped with a per-key emit_seq (max-seq row = current,
    * the heavyHittersStream consumer contract).
    *
    * Because the sketch is a pure histogram, the folded state — and
    * therefore the final emitted quantiles — is invariant under ANY
    * re-batching or re-ordering of the stream, a strictly stronger
    * guarantee than the order-preserving-cut scope the ordered twins
    * carry (MicroBatchSplitSpec feeds it a shuffled stream and pins
    * equality with the batch sketch).
    *
    * Out-of-domain values (null, NaN, or negative — outside
    * DDSketch's non-negative domain) are FILTERED at the stream
    * boundary rather than folded: a monitoring stream must not be
    * killed by one bad record, and the sketch's `require` would
    * terminate the whole query for every key (review r14). The
    * predicate is [[graft.operators.QuantileSketch.inDomain]] — the
    * SAME rule the batch entry points apply internally (ADVICE r14
    * #3), so batch/stream comparisons need no caller-side filter.
    * `maxBuckets > 0` arms the collapsing bound per fold; the batch
    * twin with the same cap produces the identical sketch (collapse
    * determinism — see [[graft.operators.QuantileSketch.collapse]]). */
  final case class QsState(dd: graft.operators.QuantileSketch.DD, emit: Long)
  final case class QsOut(event_type: String, emit_seq: Long,
      p50: Double, p95: Double, n: Long)

  def quantileStream(spark: SparkSession, events: DataFrame,
      alpha: Double = 0.01, maxBuckets: Int = 0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.QuantileSketch
    val gamma = QuantileSketch.gammaFor(alpha)
    events.select(col("event_type"), col("value").cast("double").as("value"))
      .filter(QuantileSketch.inDomain(col("value")))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, it: Iterator[(String, Double)],
            state: GroupState[QsState]) =>
          var st = state.getOption.getOrElse(
            QsState(QuantileSketch.DD(0L, Map.empty), 0L))
          // one mutable-histogram fold per micro-batch (review r14);
          // the per-fold collapse composes to the same sketch as one
          // final collapse (determinism argument in [[collapse]])
          val dd = QuantileSketch.collapse(
            QuantileSketch.foldValues(st.dd, it.map(_._2), gamma), maxBuckets)
          st = QsState(dd, st.emit + 1)
          state.update(st)
          Iterator.single(QsOut(typ, st.emit,
            QuantileSketch.quantile(dd, 0.5, gamma),
            QuantileSketch.quantile(dd, 0.95, gamma), dd.n))
      }
      .toDF("event_type", "emit_seq", "p50", "p95", "n")
  }

  /** Stateful streaming twin of `ev_attribution` (position-based
    * U-shaped multi-touch attribution): per-user GroupState buffers
    * the view/click touches of the trailing 7-day lookback in
    * (ts_us, event_id) order; each arriving purchase closes its
    * attribution IMMEDIATELY from the buffered touches, so the
    * transition depends only on (state, next item) and — under
    * order-preserving micro-batch cuts, the regime every twin here
    * documents — the union of emitted credit rows equals the batch
    * query's result at every batch boundary (MicroBatchSplitSpec).
    *
    * Straggler rule: lexicographic (ts_us, event_id) like pathsStream
    * — position credits are order-sensitive even among equal-µs ties,
    * and an at-least-once replay of a buffered touch would inflate n.
    *
    * State bound: touches inside one 7-day window per user (the same
    * activity bound the batch plan's per-conversion window carries).
    * A touch older than highwater − 7d can never enter a future
    * lookback (a future purchase's cts ≥ the highwater), so it is
    * evicted on every fold — state never grows with stream length.
    *
    * KEY-POPULATION bound (VERDICT r14 #2): content per key was
    * bounded but a user seen once held a state entry forever — at
    * stream scale the store grows with lifetime uniques. An
    * event-time timeout now REMOVES a key once the watermark passes
    * its last activity + the 7-day lookback. Eviction is
    * SEMANTICS-PRESERVING here: every buffered touch is ≤ the user's
    * last activity, so at eviction time every touch is > 7d behind
    * the watermark, and any future event the watermark admits has
    * ts ≥ watermark — outside every future purchase's lookback. The
    * straggler mark is also safely dropped: rows older than the
    * watermark never reach the function (StateEvictionSpec pins the
    * state count shrinking and output equality with eviction on).
    *
    * The watermark DELAY is the full 7-day lookback, not a token
    * 10 minutes: with EventTimeTimeout armed the engine filters
    * late-vs-watermark input before the state function, and a short
    * delay would silently drop cross-user disorder the per-user
    * straggler rule used to absorb (review r15). Batch parity is
    * therefore BOUNDED-DISORDER CONDITIONAL (the pathsStream framing,
    * ADVICE r15): a touch arriving ≤ 7 days behind the global max
    * event time is always admitted, but one further behind is dropped
    * by the pre-state watermark filter even though a purchase that is
    * itself late (ts ≥ watermark) could still have credited it in
    * batch — the old per-user straggler rule absorbed that cross-user
    * disorder, the watermark cannot. Eviction then fires at ~14 idle
    * days in event time — later, but still bounded. */
  final case class AttrState(lastTsUs: Long, lastId: Long,
      touches: Vector[(Long, Long, String)])
  final case class AttrOut(conv_id: Long, touch_id: Long,
      touch_type: String, credit: Int)

  def attributionStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val LookUs = 7L * 86400L * 1000000L
    val LookMs = LookUs / 1000L
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"), col("event_type"),
        timestamp_micros(EventTime.tsUs(events)).as("ts_ts"))
      .withWatermark("ts_ts", "7 days")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
            state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(
            AttrState(Long.MinValue, Long.MinValue, Vector.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[AttrOut]
          evs.foreach { case (id, _, ts, typ, _) =>
            val fresh = st.lastTsUs == Long.MinValue ||
              ts > st.lastTsUs || (ts == st.lastTsUs && id > st.lastId)
            if (fresh) {
              typ match {
                case "view" | "click" =>
                  st = st.copy(lastTsUs = ts, lastId = id,
                    touches = st.touches :+ ((ts, id, typ)))
                case "purchase" =>
                  // strict tts < cts like the batch query; buffer is
                  // already (tts, id)-sorted, so zipWithIndex IS the
                  // position order
                  val win = st.touches.filter(t => t._1 < ts && t._1 >= ts - LookUs)
                  val n = win.length
                  win.zipWithIndex.foreach { case ((_, tid, tty), i0) =>
                    val idx = i0 + 1
                    val credit =
                      if (n == 1) 100
                      else if (n == 2) 50
                      else if (idx == 1 || idx == n) 40
                      else 20 / (n - 2) + (if (idx - 2 < 20 % (n - 2)) 1 else 0)
                    out += AttrOut(id, tid, tty, credit)
                  }
                  st = st.copy(lastTsUs = ts, lastId = id)
                case _ =>
                  st = st.copy(lastTsUs = ts, lastId = id)
              }
              st = st.copy(touches =
                st.touches.dropWhile(_._1 < st.lastTsUs - LookUs))
            }
          }
          state.update(st)
          // evict once the watermark passes lastActivity + lookback
          // (max with the current watermark: Spark requires the stamp
          // strictly ahead of it, and a key whose horizon the
          // watermark already passed should age out next batch)
          state.setTimeoutTimestamp(
            math.max(st.lastTsUs / 1000L + LookMs, state.getCurrentWatermarkMs()) + 1L)
          out.iterator
          }
      }
      .toDF("conv_id", "touch_id", "touch_type", "credit")
  }

  final case class RetState(lastTsUs: Long, d0: Long, seen: Long)
  final case class RetOut(user_id: Long, cohort_day: Long, day_offset: Long)

  def retentionStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val DayUs = 86400000000L
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[RetState]) =>
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          var st = state.getOption.getOrElse(
            RetState(Long.MinValue, Long.MinValue, 0L))
          val out = evs.flatMap { case (_, _, ts) =>
            if (st.lastTsUs != Long.MinValue && ts < st.lastTsUs) None
            else {
              // truncate toward zero, matching the batch twin's `div`
              // (and DuckDB's `//`) even for pre-epoch timestamps
              val d = ts / DayUs
              if (st.d0 == Long.MinValue) st = st.copy(d0 = d)
              st = st.copy(lastTsUs = ts)
              val off = d - st.d0
              if (off >= 0 && off < 64 && (st.seen & (1L << off)) == 0) {
                st = st.copy(seen = st.seen | (1L << off))
                Some(RetOut(user, st.d0, off))
              } else None
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** Streaming LOCF resample: the stateful twin of `ev_locf_resample`.
    * Per-user GroupState carries (last applied (ts, id), last value,
    * next pending grid hour) — O(1) per user. Grid hour h (value =
    * the last observation at-or-before h·1h; an event exactly ON the
    * boundary counts, matching the batch window's sort) is emitted
    * once it is FINAL: either a newer event of the same user arrives
    * strictly after the boundary (in-band), or the event-time
    * watermark passes it (EventTimeTimeout flush for quiet users).
    * As in batch, the grid never extends past the user's last
    * observed hour — a quiet user's series ends at its last event's
    * hour, not at the watermark. Straggler rule: events at
    * (ts, id) <= the committed mark are dropped; for LOCF an
    * equal-ts smaller-id replay is a semantic no-op anyway (the
    * batch window's last() keeps the highest event_id at a
    * timestamp), so only a genuinely earlier-ts straggler diverges
    * from batch (the shared batch-is-reference rule). */
  final case class LocfState(lastTsUs: Long, lastId: Long, value: Double,
      nextGrid: Long)
  final case class LocfOut(user_id: Long, hour_bucket: Long, value: Double)

  def locfStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val HourUs = 3600000000L
    val HourMs = 3600000L
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"), col("value").cast("double"),
        timestamp_micros(EventTime.tsUs(events)).as("ts_ts"))
      .withWatermark("ts_ts", "10 minutes")
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
            state: GroupState[LocfState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[LocfOut]
          var stOpt = state.getOption
          // emit pending grid hours that are final: h*1h strictly
          // before `boundUs` (no more at-or-before events can arrive)
          // and h <= `capH` (the watermark path must not extend the
          // grid past the user's last observed hour; in-band the
          // incoming event's own hour already bounds the loop)
          def flush(st: LocfState, boundUs: Long, capH: Long): LocfState = {
            var h = st.nextGrid
            while (h <= capH && h * HourUs < boundUs) {
              out += LocfOut(user, h, st.value); h += 1
            }
            st.copy(nextGrid = h)
          }
          if (!state.hasTimedOut) {
            val evs = it.toArray.sortBy(e => (e._3, e._1))
            evs.foreach { case (eid, _, ts, v, _) =>
              stOpt match {
                case None =>
                  stOpt = Some(LocfState(ts, eid, v, Math.floorDiv(ts, HourUs) + 1))
                case Some(st) =>
                  if (ts < st.lastTsUs || (ts == st.lastTsUs && eid <= st.lastId)) ()
                  else stOpt = Some(flush(st, ts, Long.MaxValue)
                    .copy(lastTsUs = ts, lastId = eid, value = v))
              }
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          stOpt.foreach { st0 =>
            val st = if (wmUs > 0)
              flush(st0, wmUs, Math.floorDiv(st0.lastTsUs, HourUs)) else st0
            state.update(st)
            // re-arm only while hours are pending; the timeout stamp is
            // strictly past the next boundary, and pending implies it is
            // strictly past the current watermark as Spark requires
            if (st.nextGrid <= Math.floorDiv(st.lastTsUs, HourUs))
              state.setTimeoutTimestamp(st.nextGrid * HourMs + 1)
          }
          out.iterator
      }
      .toDF("user_id", "hour_bucket", "value")
  }

  /** Streaming Misra–Gries heavy-hitter candidates — the stateful twin
    * of `a14_heavy_hitters` (VERDICT r12 #5): the sketch is
    * streaming-native, so the candidate half of the
    * candidates-then-exact contract runs continuously with BOUNDED
    * state. The key space is sharded into `buckets` GroupState groups
    * (key → its bucket by scrambled modulus, so every occurrence of a key lands
    * in one sketch); each group carries a ≤ k-entry Misra–Gries
    * summary and folds each micro-batch's slice into it via
    * [[graft.operators.HeavyHitters.misraGriesInto]] — the state
    * machine's transition depends only on (current counters, next
    * item), so as long as micro-batch cuts PRESERVE event-time order
    * (each batch's events follow the previous batch's, the regime
    * MicroBatchSplitSpec exercises), the result is identical to one
    * pass over the full (ts_us, event_id)-ordered stream regardless
    * of where the cuts land. Late-arriving data breaks that scope:
    * per-batch sorting cannot restore global order across batches, so
    * under out-of-order ingestion only the Misra–Gries
    * candidate-superset guarantee below survives, not pass-for-pass
    * determinism (ADVICE r13 #2).
    *
    * Guarantee carried over from the batch operator: any key whose
    * count in its bucket's stream exceeds n_bucket/k survives. The
    * exact-verify half runs at any batch boundary: count only
    * candidate keys over the accumulated data and threshold —
    * byte-identical to the full GROUP BY … HAVING
    * (MicroBatchSplitSpec pins it against the batch truth).
    *
    * The sketched key mixes the heavy user keys with a unique
    * per-event tail (`user_id` for even event ids, a low-bit-tagged
    * `event_id` otherwise — see [[hitterKey]]) — the hitter-shaped distribution (few heavy
    * keys over an unbounded tail) that makes a bounded sketch
    * necessary in the first place; sketching `user_id` alone would
    * never exercise a decrement round at this fixture's cardinality.
    *
    * Emission contract (Append mode): after folding a micro-batch,
    * each bucket re-emits its full surviving candidate set stamped
    * with a per-bucket `emit_seq`; a consumer takes each bucket's
    * max-seq rows as the current candidates (≤ k rows per bucket per
    * batch — bounded, like the state), dropping [[EmptySummaryKey]]
    * sentinel rows, which mark a fold that emptied the summary. */
  final case class MgBucketState(keys: Array[Long], counts: Array[Long],
      emit: Long)
  final case class MgOut(bucket: Int, emit_seq: Long, key: Long, est: Long)

  /** Sentinel key emitted (est=0) when a fold leaves a bucket's summary
    * EMPTY — without it, the max-emit_seq consumer contract would
    * silently serve the previous batch's candidates as current (review
    * r13). Real sketched keys are non-negative by construction. */
  val EmptySummaryKey: Long = Long.MinValue

  /** The sketched key for one event — shared by the stream and the
    * spec's batch truth. The user-id space and the per-event tail
    * space are DISJOINT-TAGGED by the low bit (user keys even, event
    * keys odd) — an additive offset would alias the spaces once
    * user_id crosses the offset, silently merging distinct hitters
    * into one counter (ADVICE r13 #3). */
  def hitterKey(eventId: Long, userId: Long): Long =
    if (eventId % 2 == 0) userId << 1 else (eventId << 1) | 1L

  /** Bucket of a sketched key: multiplicative scramble before the
    * modulus — plain `key % buckets` would correlate with the key
    * construction's parity and starve half the buckets of the
    * unique-id tail. */
  def hitterBucket(key: Long, buckets: Int): Int =
    math.floorMod((key * 0x9E3779B97F4A7C15L) >>> 32, buckets.toLong).toInt

  def heavyHittersStream(spark: SparkSession, events: DataFrame,
      k: Int = 8, buckets: Int = 4): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("event_id"), col("user_id"),
        EventTime.tsUs(events).as("ts_us"))
      .as[(Long, Long, Long)]
      .groupByKey(e => hitterBucket(hitterKey(e._1, e._2), buckets))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Int, it: Iterator[(Long, Long, Long)],
            state: GroupState[MgBucketState]) =>
          // canonical (ts_us, event_id) order within the batch slice —
          // with state carried across batches this reproduces the one-
          // pass-over-the-ordered-stream summary exactly
          val evs = it.toArray.sortBy(e => (e._3, e._1))
          val m = scala.collection.mutable.LongMap.empty[Long]
          state.getOption.foreach { st =>
            var i = 0
            while (i < st.keys.length) { m(st.keys(i)) = st.counts(i); i += 1 }
          }
          graft.operators.HeavyHitters.misraGriesInto(
            m, evs.iterator.map(e => hitterKey(e._1, e._2)), k)
          val emit = state.getOption.map(_.emit + 1).getOrElse(0L)
          val arr = m.toArray.sortBy(_._1)
          state.update(MgBucketState(arr.map(_._1), arr.map(_._2), emit))
          if (arr.isEmpty) Iterator.single(MgOut(bucket, emit, EmptySummaryKey, 0L))
          else arr.iterator.map { case (key, est) => MgOut(bucket, emit, key, est) }
      }
      .toDF("bucket", "emit_seq", "key", "est")
  }

  /** Session ids per user: a new session when the gap to the previous
    * event exceeds 30 minutes (batch window form; [[sessionizeStream]]
    * is the stateful streaming counterpart). */
  def sessionize(events: DataFrame): DataFrame =
    sessionized(events).select("event_id", "user_id", "session_id")

  /** The session assignment WITH the event time kept — the shared
    * stage behind [[sessionize]] (which only projects it away) and
    * `ev_session_stats` (which aggregates per session); factored so
    * the gap rule cannot drift between the id and stats views. */
  private[graft] def sessionized(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000000L
    events
      .withColumn("ts_us", EventTime.tsUs(events))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(cum) - 1)
      .select("event_id", "user_id", "ts_us", "session_id")
  }
}
