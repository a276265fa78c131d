package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic relational operator surface of SURVEY.md §2, each expressed
  * Spark-first over the driver's TPC-H-ish parquet corpus and paired
  * with an ANSI-SQL DuckDB oracle (SparkEntry.oracleSql).
  *
  * Operator ids (f1, j6, a1, w2, ...) reference the SURVEY §2 inventory
  * rows; each query is the Spark mapping of the cited reference
  * operator, e.g. f4 ⇔ `_validate_tagval` keep/exclude semantics
  * (reference primitives.py:186-215).
  *
  * Determinism rules (SURVEY §7.3 risk 2): every query carries a
  * complete ORDER BY; doubles are rounded identically on both sides;
  * timestamps are surfaced as epoch integers.
  */
object RelationalOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S13 — scan + projection + sort sink (reference _frame.py:8-57).
    // Projection prunes the parquet read schema to 3 of 11 columns.
    "s13_scan_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // F1 — osm-type selector ⇔ isin filter, pushed to the scan
    // (reference osmquery.py:242-247).
    "f1_type_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")),

    // F2 — small id-set lookup → In pushdown (reference osmquery.py:262-276).
    "f2_idset_small" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey").isin(1L, 7L, 42L, 999L, 4242L))
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")),

    // F2b — large id-set → broadcast left-semi join (reference dense.py:107-112).
    "f2_idset_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ids = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"))
      li.join(broadcast(ids), li("l_orderkey") === ids("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F3 — must_tags ∃-semantics: key-set overlap (reference
    // primitives.py:178-183, dense.py:143-144). Tags modelled as a map
    // column; predicate = arrays_overlap(map_keys, wanted).
    "f3_must_tags" -> ((s, dir) =>
      t(s, dir, "part")
        .withColumn("tags", map(
          lit("brand"), col("p_brand"),
          lit("type"), col("p_type"),
          lit("container"), lit(null.asInstanceOf[String])))
        .filter(arrays_overlap(map_keys(map_filter(col("tags"), (_, v) => v.isNotNull)),
          array(lit("container"), lit("type"))))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")),

    // F4 — keep/exclude pair+key filter, keep_first=true:
    // kept iff (matches keep) AND NOT (matches exclude)
    // (reference primitives.py:186-215 `_validate_tagval`).
    // keep = {brand: [Brand#13, Brand#7], size: []  (any value)}
    // exclude = {type: [ECONOMY]}
    "f4_keep_first_true" -> ((s, dir) => {
      val m = map(
        lit("brand"), col("p_brand"),
        lit("type"), col("p_type"),
        lit("mkt"), lit(null.asInstanceOf[String]))
      val kps = size(map_filter(m, (k, v) =>
        (k === "brand" && v.isin("Brand#13", "Brand#7")) || k === "mkt" && v.isNotNull)) > 0
      val exs = size(map_filter(m, (k, v) =>
        k === "type" && v.isin("ECONOMY"))) > 0
      t(s, dir, "part").withColumn("tags", m)
        .filter(kps && !exs)
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")
    }),

    // F4 — keep_first=false: kept iff NOT excluded OR kept
    // (reference primitives.py:205-211 branch).
    "f4_keep_first_false" -> ((s, dir) => {
      val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      val kps = size(map_filter(m, (k, v) =>
        k === "brand" && v.isin("Brand#13"))) > 0
      val exs = size(map_filter(m, (k, v) =>
        k === "type" && v.isin("ECONOMY", "PROMO"))) > 0
      t(s, dir, "part").withColumn("tags", m)
        .filter(!exs || kps)
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")
    }),

    // F6 — relation_type value-set filter (reference primitives.py:127-130).
    "f6_relation_type" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "P"))
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")),

    // F7 — tag projection: map_filter to requested keys then project
    // (reference primitives.py:218-227, osmquery.py:107-114).
    "f7_tag_projection" -> ((s, dir) => {
      val m = map(
        lit("brand"), col("p_brand"),
        lit("type"), col("p_type"),
        lit("size"), col("p_size").cast("string"))
      val kept = map_filter(m, (k, _) => k.isin("brand", "size"))
      t(s, dir, "part")
        .withColumn("tags", kept)
        .select(col("p_partkey"),
          element_at(col("tags"), "brand").as("brand"),
          element_at(col("tags"), "size").as("size"))
        .orderBy("p_partkey")
    }),

    // F9 — min-points filter: element dropped when its ref list has <2
    // entries (reference primitives.py:76-78). refs ⇔ collect_list of
    // line numbers per order.
    "f9_min_refs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(collect_list("l_linenumber").as("refs"))
        .filter(size(col("refs")) >= 2)
        .select(col("l_orderkey"), size(col("refs")).as("n_refs"))
        .orderBy("l_orderkey")),

    // J1 — THE scale-critical equi-join: exploded refs ⋈ nodes
    // (reference osmdata.py:81-84 binary-search lookup → shuffle join;
    // SURVEY §7.3 risk 1). lineitem(fact) ⋈ part(nodes) on partkey.
    "j1_ref_coord_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(p, li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
          col("p_retailprice"))
        .orderBy("l_orderkey", "l_linenumber", "p_name", "p_retailprice")
    }),

    // J1b — the same lookup-join shape under HEAVY key skew, routed
    // through [[graft.operators.SkewJoin.saltedInner]]: ~70 % of
    // lineitem rows collapse onto one hot key (linenumber ≤ 4 → key 0),
    // which under plain hash partitioning would send 70 % of the table
    // to a single task. The salt spreads the hot key over 8 sub-keys;
    // the merge hint pins a sort-merge join so the probe exercises the
    // real distributed shape (the 25-row dim would otherwise broadcast
    // at fixture scale — at 100 TB the right side is a full table and
    // broadcast is off the table, which is exactly SkewJoin's regime).
    "j1_skew_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("k",
          when(col("l_linenumber") <= 4, lit(0L))
            .otherwise(col("l_orderkey") % 25).cast("long"))
        .select("k", "l_quantity")
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      graft.operators.SkewJoin.saltedInner(li, n.hint("merge"), "k", "nk", 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("n_name")
    }),

    // J2 — member attach join + star-schema broadcast dims
    // (reference _frame.py:33-40): revenue per region name.
    "j2_star_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    }),

    // J3 — relation→way expansion as self-join re-query
    // (reference osmdata.py:194-206): two-hop orders→lineitem→part.
    "j3_two_hop_expand" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .join(p, li("l_partkey") === p("p_partkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("p_brand"))
        .orderBy("o_orderkey", "l_linenumber", "p_brand")
    }),

    // J4 — left outer attach (reference _frame.py:126-127).
    "j4_left_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 0)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_name"))
        .orderBy("o_orderkey")
    }),

    // J6 — anti-join dedup: drop elements that appear as members
    // (reference _frame.py:27-28): parts never ordered.
    "j6_anti_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 30.0)
        .select(col("l_partkey"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // J7 — semi-join mask (reference dense.py:114-128): customers with
    // at least one open order.
    "j7_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // A1 — group first/last by explicit order (reference _frame.py:298-303):
    // first/last extendedprice per order by line number. min_by/max_by
    // keep the aggregation one-pass (no window shuffle + join-back).
    // (l_orderkey, l_linenumber) is NOT unique in this corpus — the
    // order key must include the value itself to stay deterministic.
    "a1_first_last" -> ((s, dir) => {
      val key = col("l_linenumber") * lit(10000000.0) + col("l_extendedprice")
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(min_by(col("l_extendedprice"), key).as("first_price"),
          max_by(col("l_extendedprice"), key).as("last_price"))
        .orderBy("l_orderkey")
    }),

    // A2 — group size / value_counts (reference _geometry.py:76-84).
    "a2_group_count" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_partkey")),

    // A3 — cumcount: 0-based position within group (reference _frame.py:246-249).
    "a3_cumcount" -> ((s, dir) => {
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      t(s, dir, "lineitem")
        .withColumn("pos", row_number().over(w) - 1)
        .select("l_orderkey", "l_linenumber", "pos")
        .orderBy("l_orderkey", "l_linenumber", "pos")
    }),

    // A4/A5-adjacent — min/max/avg aggregate (reference _frame.py:120,135).
    "a4_minmax" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(max(col("l_quantity")).as("max_qty"),
          min(col("l_quantity")).as("min_qty"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1)), 6).as("avg_qty"))
        .orderBy("l_returnflag")),

    // A5 — global distinct (reference osmdata.py:144).
    "a5_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // A6 — sequential per-group algorithm via typed groupByKey.mapGroups
    // (reference _frame.py:181-215 groupby-apply): order's line numbers
    // chained in sequence order. Groups are small (≤7 rows) — the same
    // shape as per-relation ring chaining.
    "a6_group_chain" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Int)]
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val chain = it.map(_._2).toArray.sorted.mkString(",")
          (k, chain)
        }
        .toDF("l_orderkey", "chain")
        .orderBy("l_orderkey")
    }),

    // A7 — union of partial results + deterministic renumbering
    // (reference osmdata.py:231-259 merge; row positions replaced by a
    // complete-key global rank, SURVEY §4.3 delta 3). A global window
    // would funnel the whole union through one task; instead: range-
    // partition + local sort (a distributed total sort), then
    // zipWithIndex's two-pass rank (per-partition counts → cumulative
    // offset + local index) — no single-task stage anywhere.
    "a7_union_renumber" -> ((s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A")
      val r = li.filter(col("l_returnflag") === "R")
      val sorted = a.unionByName(r)
        .select("l_orderkey", "l_linenumber")
        .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
      val out = sorted.rdd.zipWithIndex.map { case (row, ix) =>
        Row.fromSeq(ix +: row.toSeq)
      }
      s.createDataFrame(out,
        StructType(StructField("row_pos", LongType, nullable = false) +: sorted.schema.fields))
        .orderBy("row_pos")
    }),

    // W1 — lag/lead neighbours (reference _frame.py:251-256, 279-281).
    "w1_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .select("event_id", "user_id", "prev_value", "next_value")
        .orderBy("user_id", "event_id")
    }),

    // W2 — change-flag cumsum → run ids (reference _geometry.py:109-117,
    // _frame.py:290): per user, consecutive same-type event runs.
    "w2_run_ids" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("flag",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("run_id", sum(col("flag")).over(cum) - 1)
        .select("event_id", "user_id", "run_id")
        .orderBy("user_id", "event_id")
    }),

    // W3 — per-group head(1) (reference _frame.py:186,209-210): first
    // event of each user.
    "w3_group_head" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    }),

    // O3 — multi-key sort with complete tiebreakers (reference
    // _frame.py:158-159; Spark sort is not stable → full key).
    "o3_multikey_sort" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_quantity", "l_orderkey", "l_linenumber")
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)),

    // O4 — first-wins dedup by key with explicit order (reference
    // _frame.py:126 drop_duplicates → row_number()=1).
    "o4_dedup_first_wins" -> ((s, dir) => {
      val w = Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_partkey", "l_orderkey", "l_linenumber")
        .orderBy("l_partkey")
    }),

    // O5 — unionByName of heterogeneous partials (reference _frame.py:96,171).
    "o5_union_by_name" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
        .withColumn("src", lit("customer"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"))
        .withColumn("src", lit("supplier"))
      c.unionByName(sup).orderBy("src", "key")
    }),

    // O6 — set algebra on tag arrays (reference primitives.py:196-215):
    // intersection size with a literal set.
    "o6_set_algebra" -> ((s, dir) =>
      t(s, dir, "part")
        .withColumn("n_overlap",
          size(array_intersect(array(col("p_brand"), col("p_type")),
            array(lit("Brand#13"), lit("Brand#7"), lit("ECONOMY")))))
        .select("p_partkey", "n_overlap")
        .orderBy("p_partkey")),

    // O7 — Z-order layout key: the clustering key the writer sorts by
    // before a 100 TB layout pass (see operators/ZOrder). The gate row
    // checks the INTERLEAVE itself — the one piece with cross-engine-
    // checkable semantics — over (l_partkey, l_suppkey); zkey-ordered
    // output makes the space-filling-curve order part of the hash.
    "o7_zorder_key" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("zkey",
          graft.operators.ZOrder.key(Seq("l_partkey", "l_suppkey"), 16))
        .select("l_orderkey", "l_linenumber", "zkey")
        .orderBy("zkey", "l_orderkey", "l_linenumber")),

    // R1 — EAV→wide pivot (reference _frame.py:59-68): order counts per
    // status × priority, explicit pivot values for a deterministic schema.
    "r1_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .count()
        .orderBy("o_orderstatus")),

    // R3 — coordinate de-quantization arithmetic (reference headers.py:197-199):
    // (offset + granularity*raw) * 1e-9 in pure codegen'd expressions.
    "r3_dequantize" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("coord",
          (lit(100L) + lit(50L) * col("l_partkey")).cast("double") * lit(1e-9))
        .select("l_orderkey", "l_linenumber", "coord")
        .orderBy("l_orderkey", "l_linenumber", "coord")),

    // R4 — timestamp scaling to epoch millis (reference primitives.py:163-167).
    // Schema-adaptive via EventTime.tsUs (ns BIGINT or TIMESTAMP(_NTZ));
    // integer `div` keeps full precision (a double would lose it at 1.7e18).
    "r4_ts_epoch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.select(col("event_id"), graft.streaming.EventTime.tsUs(ev).as("us"))
        .select(col("event_id"), expr("us div 1000").as("ms"))
        .orderBy("event_id")
    }),

    // R5 — JSON expansion (reference datasource.py:153-182): from_json on
    // the events props payload.
    "r5_json_expand" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("j.k").as("k"))
        .orderBy("event_id")),

    // R6 — string normalization (reference datasource.py:184-191):
    // upper + apostrophe strip.
    "r6_string_norm" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          translate(upper(col("c_name")), "'’", "").as("norm_name"))
        .orderBy("c_custkey")),

    // R7 — area-heuristic CASE cascade (reference primitives.py:260-285):
    // nested when/otherwise over "tags", no UDF.
    "r7_case_cascade" -> ((s, dir) =>
      t(s, dir, "part")
        .withColumn("geom_class",
          when(col("p_size") < 4, "line")
            .when(col("p_brand") === "Brand#13", "area")
            .when(col("p_type").isin("ECONOMY", "PROMO"), "line")
            .when(col("p_retailprice") > 1500.0, "area")
            .otherwise("none"))
        .select("p_partkey", "geom_class")
        .orderBy("p_partkey")),

    // R9 — closed-way predicate: first ref == last ref per group
    // (reference primitives.py:256-257).
    "r9_closed_pred" -> ((s, dir) => {
      val key = col("l_linenumber") * lit(10000000L) + col("l_partkey")
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg((min_by(col("l_partkey"), key) ===
          max_by(col("l_partkey"), key)).as("closed"))
        .orderBy("l_orderkey")
    }),

    // G10 — topology segmentation (reference _frame.py:267-296): treat
    // each order as a "way" whose node chain is its partkeys in line
    // order; nodes on ≥2 ways are junctions; split chains at interior
    // junctions (duplicating the junction row), run-id segments via
    // cumsum, then first/last node per segment as source/target.
    "g10_topo_segments" -> ((s, dir) => {
      // pos must be unique within a way: derive it as a row_number over
      // the complete (linenumber, partkey) order — ties are identical
      // (pos, node) pairs, so the node sequence stays deterministic.
      val wPos = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("way"),
          row_number().over(wPos).as("pos"), col("l_partkey").as("node"))
      val wayCount = li.groupBy("node")
        .agg(countDistinct("way").as("n_ways"))
      val wWay = Window.partitionBy("way")
      val rows = li.join(wayCount, "node")
        .withColumn("is_first", col("pos") === min("pos").over(wWay))
        .withColumn("is_last", col("pos") === max("pos").over(wWay))
        .withColumn("junction", col("n_ways") >= 2)
      val interior = col("junction") && !col("is_first") && !col("is_last")
      val exploded = rows
        .withColumn("c", explode(when(interior, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
      val wOrd = Window.partitionBy("way").orderBy("pos", "c")
      val cum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seg = exploded
        .withColumn("start",
          when(col("is_first") || (col("junction") && !col("is_first") &&
            !col("is_last") && col("c") === 1), 1).otherwise(0))
        .withColumn("seg_ix", sum(col("start")).over(cum) - 1)
      seg.groupBy("way", "seg_ix")
        .agg(min_by(col("node"), col("pos") * 2 + col("c")).as("source"),
          max_by(col("node"), col("pos") * 2 + col("c")).as("target"),
          count(lit(1)).as("n_nodes"))
        .filter(col("n_nodes") >= 2)
        .orderBy("way", "seg_ix")
    })
  )

  /** Full analytics headliners (TPC-H-style): exercise the engine the
    * way a warehouse would — multi-agg pricing summary, selective
    * star-join revenue, two-sided nation-colocated revenue. Plus the
    * generic grouping-sets / ranking / distinct-agg capabilities the
    * reference lacks but a warehouse surface needs (SURVEY §2.4 note).
    */
  def analyticsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CUBE grouping sets with explicit grouping flags; partial+final
    // aggregation is automatic (HashAggregateExec expands grouping sets
    // map-side — one shuffle).
    "a8_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // ROLLUP hierarchy totals over the star join.
    "a8_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),

    // exact + distinct aggregation in one pass.
    "a9_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // exact per-group percentiles (type-7 linear interpolation in both
    // engines). Safe on l_quantity ONLY because it is integer-valued
    // with heavy ties — neighbors at a quantile index are almost
    // always equal, and when they differ the interpolant a + f·(b−a)
    // is computed from identical doubles in both engines. Money
    // columns are a documented flake trap here: midpoints of 2-decimal
    // prices land EXACTLY on the 6-digit HALF_UP boundary, where the
    // two engines' last-ulp noise rounds in different directions.
    "a10_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_quantity, 0.95)").as("p95"))
        .orderBy("l_returnflag")),

    // ranking windows: rank/dense_rank stay deterministic under ties by
    // construction; ntile gets a complete order.
    "w4_ranks" -> ((s, dir) => {
      val byQty = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").desc)
      val complete = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rnk", rank().over(byQty))
        .withColumn("drnk", dense_rank().over(byQty))
        .withColumn("nt", ntile(4).over(complete))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "rnk", "drnk", "nt")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "rnk", "drnk", "nt")
    }),

    "tpch_q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        // exact decimal accumulation, double only at the output edge:
        // float sums are order-dependent and flip round() boundaries
        // between engines; decimal sums are exact in both
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")) *
            (lit(1).cast("decimal(18,2)") + col("l_tax").cast("decimal(18,2)")))
            .cast("double").as("sum_charge"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1)), 6).as("avg_qty"),
          round(sum(col("l_discount").cast("decimal(18,2)")).cast("double") /
            count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "tpch_q3_shipping" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), unix_date(col("o_orderdate").cast("date")).as("o_date"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
    }),

    "tpch_q5_local_supplier" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q10 shape (returned-item revenue, top 20 customers):
    // selective filters reach both scans, dims broadcast, one agg on
    // customer; LIMIT is deterministic (revenue DESC — exact decimal
    // sums — then c_custkey)
    "tpch_q10_returns" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-04-01")))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .orderBy(col("revenue").desc, col("c_custkey"))
    }),

    // TPC-H Q18 shape (large-volume orders): the HAVING-filtered big
    // set feeds a key-join back into the detail — aggregate twice on
    // the same orderkey (partial agg map-side both times), never a
    // window over the raw stream
    "tpch_q18_big_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // ONE lineitem scan (guide §1.2 "don't compute things you throw
      // away"): the `big` aggregate already holds each qualifying
      // order's quantity sum, and o_orderkey is the orders PK (one
      // orders×customer row per order), so sum_qty IS `sq` — the old
      // shape re-scanned lineitem through the join purely to
      // re-aggregate the sum it had just computed. At scale lineitem
      // is the dominant table; this halves its scans. Result
      // equivalence oracle-proven at sf0.001/0.01/0.1 (the oracle SQL
      // keeps the textbook two-pass form).
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
        .filter(col("sq") > 150)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      big.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_date(col("o_orderdate").cast("date")).as("o_date"),
          col("o_totalprice"),
          col("sq").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }),

    // TPC-H Q6 shape (forecasting revenue change): the pure-scan agg —
    // every predicate reaches the parquet reader as a pushed filter,
    // zero shuffles before the single-row partial/final agg
    "tpch_q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q4 shape (order priority checking), adapted to this
    // corpus' columns: an order counts when ANY lineitem shipped after
    // the order date (the fixture has no commit/receipt dates). The
    // EXISTS is a semi join keyed on orderkey — lineitem never
    // multiplies the count
    "tpch_q4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-07-01")))
      val li = t(s, dir, "lineitem")
      val late = o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate"), "left_semi")
      late.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q14 shape (promotion effect): revenue ratio of PROMO-type
    // parts in one ship month; part is the broadcast dim, the ratio is
    // decimal-exact before one double division at the edge
    "tpch_q14_promo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
      val p = t(s, dir, "part")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(rev).cast("double"), 6).as("promo_revenue_pct"),
          sum(rev).cast("double").as("total_revenue"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive brand/size/
    // quantity bands): the OR-of-ANDs must still prune — the common
    // join key stays an equi-join and the disjunction evaluates as a
    // post-join filter over the broadcast dim's columns
    "tpch_q19_disjunctive" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      val bands =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(bands)
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n"))
    }),

    // per-group mode with a deterministic tie-break (highest count,
    // then lowest value): two-level aggregation — the inner groupBy
    // combines map-side, the ranking window then runs over one row per
    // (user, type), never the raw stream. Spark's mode() aggregate is
    // tie-nondeterministic, so cross-engine parity REQUIRES this
    // count + row_number form.
    "a11_mode" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy("user_id")
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join keeps zero-order customers, count(o_orderkey) ignores the
    // null-extended rows, then a second tiny aggregate over ≤ max
    // orders-per-customer distinct counts
    "tpch_q13_custdist" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q7 shape (volume shipping between two nation groups): the
    // dual-dimension fact query — lineitem joins BOTH its supplier's
    // nation and its order's customer's nation, with a symmetric
    // pair predicate. Scale: both dims are filtered to the
    // participating nation union BEFORE their broadcast joins (so the
    // fact stream shrinks at the first join), the two big joins
    // shuffle on l_orderkey then o_custkey, and the symmetric pair
    // filter runs as a residual after both nations attach. Revenue is
    // an exact decimal sum cast to double at the edge.
    "tpch_q7_volume" -> ((s, dir) => {
      val ns = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
      val grpA = Seq("NATION_1", "NATION_2")
      val n = t(s, dir, "nation").filter(col("n_name").isin(ns: _*))
      val sup = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("yr"),
          expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(1 - CAST(l_discount AS DECIMAL(18,2)))").as("volume"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation").isin(grpA: _*) &&
            !col("cust_nation").isin(grpA: _*)) ||
          (!col("supp_nation").isin(grpA: _*) &&
            col("cust_nation").isin(grpA: _*)))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(sum(col("volume")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // TPC-H Q8 shape (market share): national share of a region's
    // import volume in one part type, per year — a ratio of two exact
    // decimal sums over the same filtered fact stream (cast to double
    // only for the final division, rounded 6). The selective part
    // filter broadcasts FIRST so the fact stream shrinks before the
    // orderkey/custkey shuffles; customer-side nation+region and
    // supplier-side nation are broadcast dims.
    "tpch_q8_mktshare" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO").select("p_partkey")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val custAsia = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("yr"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("CAST(l_extendedprice AS DECIMAL(18,2)) * " +
            "(1 - CAST(l_discount AS DECIMAL(18,2)))").as("volume"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("yr")
        .agg(round(
            sum(when(col("supp_nation") === "NATION_3", col("volume"))
              .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).cast("double") /
            sum(col("volume")).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n"))
        .orderBy("yr")
    }),

    // TPC-H Q15 shape (top supplier by quarterly revenue): an
    // aggregate compared against its own maximum. One shuffle on
    // l_suppkey with map-side partials; the max is a single tiny
    // aggregate broadcast back as an EQUI join on the revenue value
    // (exact: both sides are the same decimal-sum-cast double), so no
    // unpartitioned window and no nested-loop join appears.
    "tpch_q15_top_supplier" -> ((s, dir) => {
      // two consumers (the max branch and the equality join) — one lazy
      // materialization instead of re-running the dominant
      // filtered-scan + aggregation stage (shared-stage doctrine)
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("total_revenue"))
        .localCheckpoint(eager = false)
      val top = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.join(broadcast(top), col("total_revenue") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // double-EXISTS plan — a semi AND an anti join against the SAME
    // fact table, both with a non-equi (<>) residual on top of the
    // orderkey equi key. This corpus has no receipt/commit dates, so
    // the "problem line" predicate is l_returnflag = 'R'; the shape is
    // the point: candidate R-lines must have ANOTHER supplier in the
    // order (semi, l2) but NO other supplier with an R-line (anti,
    // l3). All three fact branches shuffle on l_orderkey only — the
    // <> stays a residual filter, so one co-partitioned key carries
    // the whole plan; orders-F is a semi join on the same key and the
    // supplier/nation dims broadcast. Deterministic LIMIT via the
    // complete (numwait desc, s_name) order.
    "tpch_q21_waiting" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val nat = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = l1.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(o, l1("l_orderkey") === o("o_orderkey"), "left_semi")
        .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // TPC-H Q17 shape (small-quantity revenue): per-part average
    // quantity as a correlated threshold — computed once per part via
    // an aggregate and joined back, never a per-row subquery. Exact:
    // l_quantity is integer-valued so its decimal sum is lossless, and
    // the 0.2·avg threshold is the same double in both engines
    "tpch_q17_small_qty" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
        .select("p_partkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = li.groupBy("l_partkey")
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      // explicit broadcast: avgq is bounded by the FILTERED part dim
      // (one row per surviving partkey — the same cardinality bound
      // that justifies broadcast(p) above), so the probe join must
      // never be a sort-merge of the big lineitem side. Leaving it to
      // AQE's runtime flip made the plan timing-dependent: the r15
      // bench read this row anywhere between 0.6 and 1.0 s where the
      // hinted plan is stable (~2x less CPU than the SMJ form).
      li.join(broadcast(avgq), Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double") / 7.0, 6).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q22 shape (idle wealthy customers), double-sum-safe form:
    // "wealthy" is the top acctbal QUARTILE via the SQL-standard ntile
    // bucket over a complete (acctbal desc, custkey) order — pure rank
    // arithmetic, cross-engine exact where an avg() threshold over
    // full-precision doubles is not — and "idle" is an anti join
    // against orders. Aggregates per nation use count and max only
    // (order-independent on doubles). The bucket comes from
    // DistributedRank.withNtile, NOT an unpartitioned ntile window:
    // that window is a single-task sort of the whole customer table,
    // which grows with scale factor (VERDICT r11 #2). Same integer
    // bucket, every stage partitioned — PlanLintSpec pins the plan
    // free of Exchange SinglePartition.
    "tpch_q22_idle_rich" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      // "idle" = no order since the cutoff (no-orders-EVER is empty on
      // this corpus — every rich customer has ordered at least once)
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
        .select("o_custkey")
      val n = t(s, dir, "nation")
      val rich = graft.operators.DistributedRank.withNtile(c, Seq.empty,
          Seq(col("c_acctbal").desc, col("c_custkey")), 4)
        .filter(col("nt") === 1)
      rich.join(o, rich("c_custkey") === o("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"), max(col("c_acctbal")).as("max_acctbal"))
        .orderBy("n_name")
    }),

    // Exact distinct-count twin of the HyperLogLog++ sketch: this is
    // the fully-oracled ledger row (VERDICT r11 #2 — the sketch's
    // values are implementation-specific, so its old combined row was
    // the one `err: no_oracle` entry polluting the zero-err
    // invariant). The sketch itself lives in `hllDistinct` below,
    // spec-pinned by BloomSemiSpec against THIS exact twin at
    // |approx − exact| ≤ 5·rsd·exact.
    "a13_distinct_exact" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // Heavy hitters (keys above 1% of all rows) via Misra–Gries
    // candidates + exact verify: per-partition bounded k=1024 sketches
    // union into a candidate superset of every key with count > N/1024
    // (the MG guarantee; 1% ≫ 1/1024 so no true hitter can be
    // missed), then an exact counting pass over ONLY candidate-key
    // rows removes false positives — byte-identical to the plain
    // GROUP BY … HAVING oracle, while at 100 TB the shuffle carries
    // candidate rows instead of the full key cardinality. The total
    // count is a plan-time job (a12 doctrine); the threshold compares
    // as exact integers (cnt·100 > N — no division). The key is the
    // lowest set bit of l_orderkey: the corpus's natural keys are
    // near-uniform, so any fixed relative threshold degenerates to 0
    // rows as SF grows — the lowbit key has geometric frequencies
    // (2^-1, 2^-2, …) at EVERY scale, cutting at ~6-7 hitters always.
    "a14_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      // one materialized pass over the keyed projection feeds all three
      // consumers (the threshold count, the Misra-Gries candidate pass
      // and the exact verify) — the fact table is scanned once, not
      // three times (review r12)
      val keyed = t(s, dir, "lineitem")
        .select(expr("l_orderkey & -l_orderkey").as("hk"))
        .localCheckpoint(eager = false)
      val total = keyed.count()
      val cands = keyed.as[Long]
        .mapPartitions(it =>
          graft.operators.HeavyHitters.misraGries(it, 1024).keysIterator)
        .toDF("hk").distinct()
      keyed.join(broadcast(cands), Seq("hk"), "left_semi")
        .groupBy("hk").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 100 > total)
        .orderBy("hk")
    }),

    // ----------------------------------------------------------------
    // TPC-H completion set (VERDICT r17 task 4): q2/q9/q11/q12/q16/q20
    // adapted to this corpus — no partsupp table, no commit/receipt
    // dates, no availqty — so the lineitem link stands in for partsupp
    // and scalar thresholds are RELATIVE (vs the filtered set's own
    // average), which keeps every SF non-empty where TPC-H's absolute
    // `0.0001/SF` fractions cannot be expressed without knowing SF.
    // Each preserves the ORIGINAL query's join/agg SHAPE, which is the
    // point: correlated per-group min (q2), 5-way join + expression
    // aggregation (q9), global-scalar HAVING (q11), conditional CASE
    // sums over a date-arithmetic join (q12), anti-join exclusion +
    // distinct agg (q16), nested semi over aggregated lineitem (q20).

    // TPC-H Q2 shape (minimum-cost supplier): for each STANDARD size-15
    // part, the EUROPE supplier(s) achieving the per-part minimum unit
    // price — the correlated scalar-min subquery, computed ONCE as an
    // aggregate over the shared (part, supplier) cost table and joined
    // back on (partkey, cost) equality. `cost` is min(l_extendedprice),
    // a pure double MIN — picks an existing value, no arithmetic, so
    // the equality join is cross-engine exact. The cost table is
    // lazily checkpointed: two consumers (the min branch and the
    // equality probe) must see one materialization, not two scans.
    "tpch_q2_min_cost" -> ((s, dir) => {
      val pp = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select("p_partkey")
      val eu = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val costs = t(s, dir, "lineitem")
        .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(min(col("l_extendedprice")).as("cost"))
        .localCheckpoint(eager = false)
      // bounded by the FILTERED part dim (one row per surviving
      // partkey) — the q17 avgq doctrine: broadcast, never SMJ
      val minc = costs.groupBy(col("p_partkey").as("mp"))
        .agg(min(col("cost")).as("min_cost"))
      costs.join(broadcast(minc),
          col("p_partkey") === col("mp") && col("cost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
    }),

    // TPC-H Q9 shape (product-type profit): the 5-way join with an
    // expression aggregate — profit = revenue − 5% of retail·quantity
    // (p_retailprice stands in for the missing ps_supplycost). Both
    // sums accumulate decimal-exact; the −5% lands as exactly two
    // IEEE double ops (one multiply, one subtract) on identical exact
    // inputs at the output edge, so no round() is needed. Part is the
    // selective broadcast FIRST (shrinks the fact stream before the
    // orderkey shuffle); supplier→nation broadcasts as one dim.
    "tpch_q9_profit" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      val cost = col("p_retailprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "yr")
        .agg((sum(rev).cast("double") -
            lit(0.05) * sum(cost).cast("double")).as("sum_profit"),
          count(lit(1)).as("n"))
        .orderBy(col("n_name"), col("yr").desc)
    }),

    // TPC-H Q11 shape (important stock): per-part value with a HAVING
    // against a GLOBAL scalar of the same aggregate. Value accumulates
    // as exact integer CENTS (decimal → ×100 → long) so the threshold
    // compares as pure integers — value·N > Σvalue, cross-multiplied
    // to avoid any division — with the two scalars computed as one
    // plan-time job on the shared lazily-checkpointed value table (the
    // a12/a14 doctrine: a scalar aggregate is a bounded driver value,
    // not a per-row subquery). Nation group chosen to have suppliers
    // at EVERY SF (sf0.001 populates only 10 of the 25 nations).
    "tpch_q11_important_parts" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name").isin(
          "NATION_3", "NATION_8", "NATION_12", "NATION_13"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = t(s, dir, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("value_cents"))
        .localCheckpoint(eager = false)
      val r0 = vals.agg(sum(col("value_cents")), count(lit(1))).head()
      // empty filtered set → NULL sum: return the (schema-correct)
      // empty result the oracle's empty CTE yields, instead of an NPE
      // on getLong (review r18 — the stock fixtures are non-empty at
      // every SF, but the operator must not crash on other corpora)
      if (r0.isNullAt(0))
        vals.limit(0).orderBy(col("value_cents").desc, col("l_partkey"))
      else {
        val (tot, nparts) = (r0.getLong(0), r0.getLong(1))
        vals.filter(col("value_cents") * lit(nparts) > lit(tot))
          .orderBy(col("value_cents").desc, col("l_partkey"))
      }
    }),

    // TPC-H Q12 shape (shipping-mode priority split): conditional CASE
    // sums over a join with DATE ARITHMETIC in the predicate — "late"
    // is shipped >60 days after the order date (the corpus has no
    // commit/receipt dates; l_linestatus stands in for l_shipmode).
    // The ship-year filter pushes to the lineitem scan; the 60-day
    // comparison is a residual on the orderkey equi-join.
    "tpch_q12_late_lines" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '60' DAY"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    // counts per (brand, type, size) with a SET EXCLUSION — suppliers
    // with negative account balance stand in for the reference's
    // complaint-comment LIKE (same shape: a small anti-join build
    // side). The NOT/IN part filters ride the broadcast dim; the
    // distinct agg shuffles once on the 3-part group key.
    "tpch_q16_supplier_cnt" -> ((s, dir) => {
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q20 shape (potential part promotion): the nested semi over
    // AGGREGATED lineitem — suppliers qualify when some red part they
    // shipped in 1997 exceeds the average per-(supplier, part) volume
    // (availqty does not exist; the relative threshold replaces
    // `> 0.5·sum(qty)` and stays non-empty at every SF). Quantities
    // accumulate as exact integer units; the threshold cross-multiplies
    // (sq·N > Σsq) from one plan-time scalar job on the shared
    // checkpointed pair table. The qualifying-supplier set then semi-
    // joins the nation-filtered supplier dim.
    "tpch_q20_promo_suppliers" -> ((s, dir) => {
      val rp = t(s, dir, "part").filter(col("p_name").like("%red%")).select("p_partkey")
      val pairs = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(broadcast(rp), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)").cast("long")).as("sq"))
        .localCheckpoint(eager = false)
      val r0 = pairs.agg(sum(col("sq")), count(lit(1))).head()
      // empty pair set → NULL sum → no hot suppliers (the oracle's
      // empty CTE), never an NPE (review r18)
      val hot =
        if (r0.isNullAt(0)) pairs.limit(0).select("l_suppkey")
        else {
          val (tot, npairs) = (r0.getLong(0), r0.getLong(1))
          pairs.filter(col("sq") * lit(npairs) > lit(tot))
            .select("l_suppkey").distinct()
        }
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name").isin(
          "NATION_15", "NATION_18", "NATION_19", "NATION_20", "NATION_21"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }),

    // Broadcast-Bloom prefiltered semi join — the 100 TB shuffle-
    // pruning pattern: build a Bloom filter over the selective build
    // side's keys (one small aggregation job), prune the fact scan
    // with a codegen'd membership probe BEFORE the shuffle, then let
    // the exact semi join remove the false positives. The result is
    // byte-identical to the plain semi join (the oracle), while at
    // scale the shuffle carries only might-match rows (~selectivity +
    // fpp of the fact table instead of all of it).
    "a12_bloom_semi" -> ((s, dir) => {
      // lazily materialize the selective build side ONCE: three
      // consumers (the sizing count, the bloom build, the semi-join
      // broadcast) would otherwise each re-scan orders
      val sel = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000.0)
        .select("o_orderkey")
        .localCheckpoint(eager = false)
      // size the filter from the ACTUAL build side (ADVICE r11: a
      // hard-coded expectedNumItems silently degrades fpp when the
      // build side outgrows it) — one extra count job at plan time on
      // the already-selective dim slice
      val n = math.max(sel.count(), 1L)
      val bloom = sel.stat.bloomFilter("o_orderkey", n, 0.01)
      val li = t(s, dir, "lineitem")
        .filter(graft.functions.BloomMightContain.probe(s, col("l_orderkey"), bloom))
      li.join(broadcast(sel), li("l_orderkey") === sel("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }))

  /** HyperLogLog++ approximate distinct — the sketch that replaces
    * exact countDistinct when the key cardinality itself is the
    * bottleneck: partial sketches merge map-side, so the shuffle
    * carries one ~1.5 KB sketch per group per partition instead of
    * every distinct key. Deliberately NOT a `queries` entry: sketch
    * values are implementation-specific, so a DuckDB oracle cannot
    * exist and a rows-only ledger row would carry a permanent `err`.
    * BloomSemiSpec pins it against the `a13_distinct_exact` oracle
    * row at |approx − exact| ≤ 5·rsd·exact. */
  def hllDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  def analyticsOracle: Map[String, String] = Map(
    "a8_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "a8_rollup" ->
      """SELECT n_name, o_orderstatus, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, o_orderstatus)
         ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""",
    "a9_distinct_agg" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_orderkey) AS n_orders,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a10_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.75) AS p75,
                quantile_cont(l_quantity, 0.95) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "w4_ranks" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
                dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
                ntile(4) OVER (PARTITION BY l_returnflag
                               ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS nt
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_returnflag, rnk, drnk, nt""",
    "tpch_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
                         (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
                round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "tpch_q3_shipping" ->
      """SELECT l_orderkey,
                datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_date,
                o_orderpriority,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1998-03-15'
         GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey""",
    "tpch_q5_local_supplier" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "tpch_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1998-01-01'
           AND o_orderdate < TIMESTAMP '1998-04-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q18_big_orders" ->
      """WITH big AS (
           SELECT l_orderkey FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
         SELECT c_custkey, c_name, o_orderkey,
                datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_date,
                o_totalprice,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         JOIN big USING (l_orderkey)
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2, 3, 4, 5
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "tpch_q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey) t
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "tpch_q7_volume" ->
      """SELECT supp_nation, cust_nation, yr,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                  year(l_shipdate) AS yr, l_extendedprice, l_discount
           FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE ((n1.n_name IN ('NATION_1','NATION_2')
                   AND n2.n_name IN ('NATION_3','NATION_4'))
               OR (n1.n_name IN ('NATION_3','NATION_4')
                   AND n2.n_name IN ('NATION_1','NATION_2')))
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01') t
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "tpch_q8_mktshare" ->
      """WITH vol AS (
           SELECT year(o_orderdate) AS yr,
                  CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                  n2.n_name AS supp_nation
           FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           WHERE r_name = 'ASIA' AND p_type = 'PROMO'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01')
         SELECT yr,
                round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                      CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
                count(*) AS n
         FROM vol GROUP BY yr ORDER BY yr""",
    "tpch_q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey AS supplier_no,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier JOIN rev ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "tpch_q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders, nation
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
           AND s_nationkey = n_nationkey
           AND n_name IN ('NATION_1','NATION_2','NATION_3')
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
    "tpch_q17_small_qty" ->
      """WITH pp AS (SELECT p_partkey FROM part
                     WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'),
         li AS (SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem JOIN pp ON l_partkey = p_partkey),
         av AS (SELECT l_partkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
                       count(*) AS avg_qty
                FROM li GROUP BY 1)
         SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
                      6) AS avg_yearly,
                count(*) AS n
         FROM li JOIN av USING (l_partkey)
         WHERE l_quantity < 0.2 * avg_qty""",
    "tpch_q22_idle_rich" ->
      """WITH ranked AS (
           SELECT c_custkey, c_nationkey, c_acctbal,
                  ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS q
           FROM customer),
         rich AS (SELECT * FROM ranked WHERE q = 1)
         SELECT n_name, count(*) AS numcust, max(c_acctbal) AS max_acctbal
         FROM rich JOIN nation ON c_nationkey = n_nationkey
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY n_name ORDER BY n_name""",
    "tpch_q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "tpch_q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q14_promo" ->
      """SELECT round(100.0 *
                  CAST(sum(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                     (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                  6) AS promo_revenue_pct,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-09-01'
           AND l_shipdate < TIMESTAMP '1997-10-01'""",
    "tpch_q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
    "a11_mode" ->
      """WITH counts AS (
           SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         ranked AS (
           SELECT user_id, event_type, n,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY n DESC, event_type) AS rn
           FROM counts)
         SELECT user_id, event_type AS mode_type, n
         FROM ranked WHERE rn = 1 ORDER BY user_id""",
    // the Bloom prefilter is exactness-invisible: the oracle is the
    // PLAIN semi join aggregate
    "a12_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey
                         AND o_orderstatus = 'F' AND o_totalprice > 250000.0)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a14_heavy_hitters" ->
      """SELECT l_orderkey & -l_orderkey AS hk, count(*) AS cnt
         FROM lineitem GROUP BY 1
         HAVING count(*) * 100 > (SELECT count(*) FROM lineitem)
         ORDER BY hk""",
    "a13_distinct_exact" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "tpch_q2_min_cost" ->
      """WITH pp AS (SELECT p_partkey FROM part
                     WHERE p_size = 15 AND p_type = 'STANDARD'),
         eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'),
         costs AS (SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
                          min(l_extendedprice) AS cost
                   FROM lineitem JOIN pp ON l_partkey = p_partkey
                   JOIN eu ON l_suppkey = s_suppkey
                   GROUP BY 1, 2, 3, 4, 5)
         SELECT s_acctbal, s_name, n_name, p_partkey, cost
         FROM costs c
         WHERE cost = (SELECT min(cost) FROM costs c2
                       WHERE c2.p_partkey = c.p_partkey)
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "tpch_q9_profit" ->
      """SELECT n_name, yr,
                CAST(sum(rev) AS DOUBLE) - 0.05 * CAST(sum(cost) AS DOUBLE)
                  AS sum_profit,
                count(*) AS n
         FROM (
           SELECT n_name, year(o_orderdate) AS yr,
                  CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
                  CAST(p_retailprice AS DECIMAL(18,2)) *
                  CAST(l_quantity AS DECIMAL(18,2)) AS cost
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE p_name LIKE '%red%') t
         GROUP BY 1, 2 ORDER BY n_name, yr DESC""",
    "tpch_q11_important_parts" ->
      """WITH sup AS (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name IN ('NATION_3','NATION_8',
                                       'NATION_12','NATION_13')),
         vals AS (SELECT l_partkey,
                         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                       * 100 AS BIGINT)) AS BIGINT) AS value_cents
                  FROM lineitem
                  WHERE l_suppkey IN (SELECT s_suppkey FROM sup)
                  GROUP BY 1)
         SELECT l_partkey, value_cents FROM vals
         WHERE value_cents * (SELECT count(*) FROM vals)
               > (SELECT sum(value_cents) FROM vals)
         ORDER BY value_cents DESC, l_partkey""",
    "tpch_q12_late_lines" ->
      """SELECT l_linestatus,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "tpch_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0
                                   AND s_suppkey IS NOT NULL)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q20_promo_suppliers" ->
      """WITH pairs AS (
           SELECT l_suppkey, l_partkey,
                  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
                    AS BIGINT) AS sq
           FROM lineitem
           JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') rp
             ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY 1, 2),
         hot AS (SELECT DISTINCT l_suppkey FROM pairs
                 WHERE sq * (SELECT count(*) FROM pairs)
                       > (SELECT sum(sq) FROM pairs))
         SELECT s_name, s_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name IN ('NATION_15','NATION_18','NATION_19',
                          'NATION_20','NATION_21')
           AND s_suppkey IN (SELECT l_suppkey FROM hot)
         ORDER BY s_name""")

  // ------------------------------------------------------------ oracle SQL

  def oracle: Map[String, String] = Map(
    "s13_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "f1_type_filter" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
         WHERE l_returnflag IN ('A','R')
         ORDER BY l_orderkey, l_linenumber, l_returnflag""",
    "f2_idset_small" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE l_orderkey IN (1,7,42,999,4242)
         ORDER BY l_orderkey, l_linenumber, l_partkey""",
    "f2_idset_semi" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_totalprice > 400000.0)
         ORDER BY l_orderkey, l_linenumber""",
    "f3_must_tags" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE p_type IS NOT NULL ORDER BY p_partkey""",
    "f4_keep_first_true" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE p_brand IN ('Brand#13','Brand#7') AND p_type NOT IN ('ECONOMY')
         ORDER BY p_partkey""",
    "f4_keep_first_false" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE NOT (p_type IN ('ECONOMY','PROMO')) OR p_brand IN ('Brand#13')
         ORDER BY p_partkey""",
    "f6_relation_type" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderstatus IN ('F','P') ORDER BY o_orderkey""",
    "f7_tag_projection" ->
      """SELECT p_partkey, p_brand AS brand, CAST(p_size AS VARCHAR) AS size
         FROM part ORDER BY p_partkey""",
    "f9_min_refs" ->
      """SELECT l_orderkey, count(*) AS n_refs FROM lineitem
         GROUP BY l_orderkey HAVING count(*) >= 2 ORDER BY l_orderkey""",
    "j1_ref_coord_join" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_retailprice
         FROM lineitem JOIN part ON l_partkey = p_partkey
         ORDER BY l_orderkey, l_linenumber, p_name, p_retailprice""",
    // salting is a pure execution-strategy change — the oracle is the
    // plain skewed-key join
    "j1_skew_salted" ->
      """SELECT n_name, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM (SELECT CASE WHEN l_linenumber <= 4 THEN 0
                           ELSE l_orderkey % 25 END AS k, l_quantity
               FROM lineitem) t
         JOIN nation ON k = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "j2_star_broadcast" ->
      """SELECT r_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "j3_two_hop_expand" ->
      """SELECT o_orderkey, l_linenumber, p_brand
         FROM orders
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey, l_linenumber, p_brand""",
    "j4_left_join" ->
      """SELECT o_orderkey, c_name
         FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
         ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "j6_anti_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey AND l_quantity >= 30.0)
         ORDER BY p_partkey""",
    "j7_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         ORDER BY c_custkey""",
    "a1_first_last" ->
      """SELECT l_orderkey,
                arg_min(l_extendedprice, l_linenumber * 10000000.0 + l_extendedprice) AS first_price,
                arg_max(l_extendedprice, l_linenumber * 10000000.0 + l_extendedprice) AS last_price
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "a2_group_count" ->
      """SELECT l_partkey, count(*) AS n FROM lineitem
         GROUP BY l_partkey ORDER BY l_partkey""",
    "a3_cumcount" ->
      """SELECT l_orderkey, l_linenumber,
                row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS pos
         FROM lineitem ORDER BY l_orderkey, l_linenumber, pos""",
    "a4_minmax" ->
      """SELECT l_returnflag, max(l_quantity) AS max_qty, min(l_quantity) AS min_qty,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a5_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "a6_group_chain" ->
      """SELECT l_orderkey,
                string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS chain
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "a7_union_renumber" ->
      """SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS row_pos,
                l_orderkey, l_linenumber
         FROM lineitem WHERE l_returnflag IN ('A','R')
         ORDER BY row_pos""",
    "w1_lag_lead" ->
      """SELECT event_id, user_id,
                lag(value) OVER w AS prev_value,
                lead(value) OVER w AS next_value
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "w2_run_ids" ->
      """WITH o AS (
           SELECT event_id, user_id, ts, event_type,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END AS flag
           FROM o)
         SELECT event_id, user_id,
                CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS run_id
         FROM f ORDER BY user_id, event_id""",
    "w3_group_head" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "o3_multikey_sort" ->
      """SELECT l_quantity, l_orderkey, l_linenumber FROM lineitem
         ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC""",
    "o4_dedup_first_wins" ->
      """SELECT l_partkey, l_orderkey, l_linenumber FROM (
           SELECT l_partkey, l_orderkey, l_linenumber,
                  row_number() OVER (PARTITION BY l_partkey
                                     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn = 1 ORDER BY l_partkey""",
    "o5_union_by_name" ->
      """SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
         UNION ALL
         SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier
         ORDER BY src, key""",
    "o6_set_algebra" ->
      """SELECT p_partkey,
                CAST(p_brand IN ('Brand#13','Brand#7') AS INT) +
                CAST(p_type IN ('ECONOMY') AS INT) AS n_overlap
         FROM part ORDER BY p_partkey""",
    "o7_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber,
                 ${graft.operators.ZOrder.keySql(Seq("l_partkey", "l_suppkey"), 16)} AS zkey
          FROM lineitem ORDER BY zkey, l_orderkey, l_linenumber""",
    "r1_pivot" ->
      """SELECT o_orderstatus,
                CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT",
                CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH",
                CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM",
                CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
                CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS "5-LOW"
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "r3_dequantize" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(100 + 50 * l_partkey AS DOUBLE) * 1e-9 AS coord
         FROM lineitem ORDER BY l_orderkey, l_linenumber, coord""",
    "r4_ts_epoch" ->
      """SELECT event_id, epoch_ms(ts) AS ms FROM events ORDER BY event_id""",
    "r5_json_expand" ->
      """SELECT event_id,
                CAST(replace(replace(props, '{"k": ', ''), '}', '') AS INT) AS k
         FROM events ORDER BY event_id""",
    "r6_string_norm" ->
      """SELECT c_custkey, replace(replace(upper(c_name), '''', ''), '’', '') AS norm_name
         FROM customer ORDER BY c_custkey""",
    "r7_case_cascade" ->
      """SELECT p_partkey,
                CASE WHEN p_size < 4 THEN 'line'
                     WHEN p_brand = 'Brand#13' THEN 'area'
                     WHEN p_type IN ('ECONOMY','PROMO') THEN 'line'
                     WHEN p_retailprice > 1500.0 THEN 'area'
                     ELSE 'none' END AS geom_class
         FROM part ORDER BY p_partkey""",
    "r9_closed_pred" ->
      """SELECT l_orderkey,
                arg_min(l_partkey, l_linenumber * 10000000 + l_partkey) =
                arg_max(l_partkey, l_linenumber * 10000000 + l_partkey) AS closed
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "g10_topo_segments" ->
      """WITH li AS (
           SELECT l_orderkey AS way,
                  row_number() OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS pos,
                  l_partkey AS node
           FROM lineitem),
         wc AS (
           SELECT node, count(DISTINCT way) AS n_ways FROM li GROUP BY node),
         rows0 AS (
           SELECT li.way, li.pos, li.node,
                  li.pos = min(li.pos) OVER (PARTITION BY li.way) AS is_first,
                  li.pos = max(li.pos) OVER (PARTITION BY li.way) AS is_last,
                  wc.n_ways >= 2 AS junction
           FROM li JOIN wc USING (node)),
         exploded AS (
           SELECT r.*, u.c FROM rows0 r
           CROSS JOIN (SELECT unnest([0,1]) AS c) u
           WHERE u.c = 0 OR (r.junction AND NOT r.is_first AND NOT r.is_last)),
         seg AS (
           SELECT *,
                  CAST(sum(CASE WHEN is_first OR (junction AND NOT is_first AND NOT is_last AND c = 1)
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY way ORDER BY pos, c ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS seg_ix
           FROM exploded)
         SELECT way, seg_ix,
                arg_min(node, pos * 2 + c) AS source,
                arg_max(node, pos * 2 + c) AS target,
                count(*) AS n_nodes
         FROM seg GROUP BY way, seg_ix HAVING count(*) >= 2
         ORDER BY way, seg_ix"""
  )
}
