package graft.osm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.Wkb
import graft.geom.Wkb.Coord

/** Compiles an [[OsmQuery]] into a Spark dataflow over the osmpbf
  * DataSource (SURVEY §3.2): one declarative plan instead of the
  * reference's per-block compile/execute/merge loop
  * (reference osmdata.py:183-259) — Catalyst handles pushdown and AQE
  * picks join strategies; blob-granular partitions replace per-block
  * skipping.
  *
  * Scale notes (the node-coordinate join is THE critical join, SURVEY
  * §7.3 risk 1): way assembly shuffles `posexplode(refs)` against the
  * node table on node id — a plain equi-join that AQE can re-plan;
  * per-way/per-relation assembly then uses `groupByKey.mapGroups`,
  * whose groups are bounded by OSM data (ways ≤ 2000 nodes, relation
  * member lists are small), so no group can blow an executor.
  */
object OsmQueryExec {

  import graft.sources.OsmPbfSource.{TypeNode, TypeRelation, TypeWay}

  // --- area heuristic tag tables (reference defaults.py:5-62) ---
  val NotArea: Map[String, Seq[String]] = Map(
    "area:highway" -> Seq("no"),
    "aeroway" -> Seq("no", "taxiway"),
    "amenity" -> Seq("no"),
    "boundary" -> Seq("no"),
    "building:part" -> Seq("no"),
    "building" -> Seq("no"),
    "craft" -> Seq("no"),
    "golf" -> Seq("no"),
    "historic" -> Seq("no"),
    "indoor" -> Seq("no"),
    "landuse" -> Seq("no"),
    "leisure" -> Seq("no"),
    "man_made" -> Seq("no", "cutline", "embankment", "pipeline"),
    "natural" -> Seq("no", "coastline", "cliff", "ridge", "arete", "tree_row"),
    "office" -> Seq("no"),
    "place" -> Seq("no"),
    "public_transport" -> Seq("no"),
    "ruins" -> Seq("no"),
    // "shops" (not "shop") is faithful to the reference table
    // (defaults.py:24 has "shops" in NOT_AREA while defaults.py:54 has
    // "shop" in IS_AREA_KEY) — the shop=no demotion never fires there
    // either; kept for parity.
    "shops" -> Seq("no"),
    "tourism" -> Seq("no"))

  val IsArea: Map[String, Seq[String]] = Map(
    "barrier" -> Seq("city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes"),
    "highway" -> Seq("services", "rest_area", "escape", "elevator"),
    "power" -> Seq("plant", "substation", "generator", "transformer"),
    "railway" -> Seq("station", "turntable", "roundhouse", "platform"),
    "waterway" -> Seq("riverbank", "dock", "boatyard", "dam"))

  val IsAreaKeyAnyValue: Seq[String] = Seq(
    "area", "area:highway", "aeroway", "amenity", "boundary", "building",
    "building:part", "craft", "golf", "historic", "indoor", "landuse",
    "leisure", "man_made", "natural", "office", "place", "public_transport",
    "ruins", "shop", "tourism")

  val RelationLine: Seq[String] = Seq("route")
  val RelationArea: Seq[String] = Seq("multipolygon", "boundary")

  /** Above this many ids, F2 id-set lookup switches from literal
    * `isin` (scan-pushable, but a plan-exploding In expression at
    * scale) to a broadcast left-semi join. */
  private[osm] val LargeIdSetThreshold = 1000

  // ------------------------------------------------------------------

  private[osm] def scan(spark: SparkSession, path: String): DataFrame =
    dedupMultiFile(spark.read.format("osmpbf").load(path), path)

  /** Adjacent region extracts duplicate border elements; a multi-file
    * corpus therefore dedups on the stable (type, id) key (copies are
    * identical, so arbitrary-wins is exact) — otherwise a way present
    * in two files doubles its geometry vertices and turns every one of
    * its nodes into a topology junction. Single-file scans (the common
    * case) skip the shuffle entirely.
    *
    * Border-range split (VERDICT r21 task 4, guide §2.5 hot-key split +
    * §6 pushdown): a (type, id) key present in ≥ 2 files necessarily
    * lies inside the pairwise INTERSECTION of those files' per-type id
    * spans — plan-time metadata from the cached per-blob stats walk.
    * Rows outside every intersection are globally unique and PASS
    * THROUGH with no exchange; only rows inside the border intervals
    * are re-scanned (a second scan whose `idRanges` option prunes to
    * the border blobs at the source) and deduped. The full-row dedup
    * exchange therefore carries only border rows — on adjacent
    * real-world extracts a few percent of the corpus — instead of
    * every element. Degenerate id layouts (border intervals covering
    * most blobs, e.g. fully interleaved ids) fall back to the plain
    * full dedup via `spark.graft.osm.borderBlobFrac` (default 0.5);
    * disjoint id spaces skip the dedup outright. */
  private def dedupMultiFile(df: DataFrame, path: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val files = graft.pbf.OsmPbfFile.expand(path,
      spark.sparkContext.hadoopConfiguration)
    if (files.size <= 1) return df
    val ranges = borderRanges(path)
    if (ranges.isEmpty) return df
    // cached driver metadata (per-file planning cache) — these are map
    // lookups, not re-walks; the intersection test is THE shared blob
    // predicate, so this fraction decision and the border scan's actual
    // blob pruning can never diverge (review r22)
    val blobs = graft.pbf.OsmPbfFile.indexAll(path)
    val rngs = graft.sources.OsmPbfStats.ranges(path, blobs)
    val allTypes = Array(true, true, true)
    val nBorder = rngs.count(
      graft.sources.OsmPbfScan.blobIntersects(_, allTypes, ranges))
    val maxFrac =
      spark.conf.get("spark.graft.osm.borderBlobFrac", "0.5").toDouble
    if (nBorder > maxFrac * blobs.size) return df.dropDuplicates("type", "id")
    val inBorder = ranges.map { case (t, lo, hi) =>
      col("type") === lit(t) && col("id") >= lo && col("id") <= hi
    }.reduce(_ || _)
    val borderScan = spark.read.format("osmpbf")
      .options(opts + ("idRanges" ->
        graft.sources.OsmPbfSource.serializeIdRanges(ranges)))
      .load(path)
    df.filter(!inBorder).unionByName(
      borderScan.filter(inBorder).dropDuplicates("type", "id"))
  }

  /** Cross-file border intervals per type, merged: the pairwise
    * intersections of the files' per-type id spans (derived from the
    * cached per-blob stats walk — driver metadata, no element decode).
    * Empty ⇔ the files' id spaces are disjoint for every type ⇔ no
    * key can be duplicated. */
  private[osm] def borderRanges(path: String): Seq[(Int, Long, Long)] = {
    val blobs = graft.pbf.OsmPbfFile.indexAll(path)
    val rngs = graft.sources.OsmPbfStats.ranges(path, blobs)
    val perFile = blobs.zip(rngs).groupBy(_._1.path).values.map { xs =>
      val acc = Array(Long.MaxValue, Long.MinValue, Long.MaxValue,
        Long.MinValue, Long.MaxValue, Long.MinValue)
      xs.foreach { case (_, a) =>
        var t = 0
        while (t < 3) {
          if (a(2 * t) < acc(2 * t)) acc(2 * t) = a(2 * t)
          if (a(2 * t + 1) > acc(2 * t + 1)) acc(2 * t + 1) = a(2 * t + 1)
          t += 1
        }
      }
      acc
    }.toSeq
    val raw = for {
      i <- perFile.indices
      j <- (i + 1) until perFile.size
      t <- 0 to 2
      lo = math.max(perFile(i)(2 * t), perFile(j)(2 * t))
      hi = math.min(perFile(i)(2 * t + 1), perFile(j)(2 * t + 1))
      if lo <= hi
    } yield (t, lo, hi)
    raw.groupBy(_._1).toSeq.flatMap { case (t, ivs) =>
      ivs.map(x => (x._2, x._3)).sortBy(_._1)
        .foldLeft(List.empty[(Long, Long)]) {
          case ((plo, phi) :: rest, (lo, hi)) if lo <= phi =>
            (plo, math.max(phi, hi)) :: rest
          case (acc, iv) => iv :: acc
        }.reverse.map { case (lo, hi) => (t, lo, hi) }
    }.sorted
  }

  /** keep/exclude pair+key match over the tags map — one side of the
    * `_validate_tagval` truth table (reference primitives.py:186-215).
    * Empty value list = any value (key-only match). */
  private def tagSpecMatch(tags: Column, spec: Map[String, Seq[String]]): Column =
    spec.foldLeft(lit(false)) { case (acc, (k, vs)) =>
      val hit =
        if (vs.isEmpty) map_contains_key(tags, lit(k))
        else coalesce(try_element_at(tags, lit(k)).isin(vs.map(v => v: Any): _*), lit(false))
      acc || hit
    }

  /** Full element-keep predicate, exactly the reference formula:
    * keepFirst ? (kps && !exs) : (!exs || kps)
    * — including the documented edge case that an element with no
    * matching information resolves to `!keepFirst`
    * (reference primitives.py:186-215). */
  def tagPredicate(q: OsmQuery, tags: Column): Column = {
    val must =
      if (q.mustTags.isEmpty) lit(true)
      else arrays_overlap(map_keys(tags), array(q.mustTags.map(lit): _*))
    val kps = q.keep.map(tagSpecMatch(tags, _)).getOrElse(lit(false))
    val exs = q.exclude.map(tagSpecMatch(tags, _)).getOrElse(lit(false))
    val noTagval = q.mustTags.isEmpty && q.keep.isEmpty && q.exclude.isEmpty
    val body =
      if (noTagval) lit(!q.keepFirst)
      else if (q.keepFirst) kps && !exs
      else !exs || kps
    must && body
  }

  /** Way line/area heuristic as a pure Column cascade (reference
    * primitives.py:260-285 `_way_geotype` intended semantics — the
    * reference's `_is_area` has dead branches from `if not <set>`
    * confusion; we implement the documented intent, SURVEY §2.7 R7). */
  def wayIsArea(tags: Column, refs: Column): Column = {
    val closed = element_at(refs, 1) === element_at(refs, -1)
    val areaNo = coalesce(try_element_at(tags, lit("area")) === "no", lit(false))
    val isAreaPair = tagSpecMatch(tags, IsArea)
    val notAreaPair = tagSpecMatch(tags, NotArea)
    val anyKey = arrays_overlap(map_keys(tags), array(IsAreaKeyAnyValue.map(lit): _*))
    size(refs) >= 4 && closed && !areaNo &&
      (isAreaPair || (!notAreaPair && anyKey))
  }

  /** Relation geometry dispatch (reference primitives.py:288-305):
    * 0 none / 2 line / 3 area; relations with node or relation members
    * get no geometry (documented limitation Q6, super-relations are not
    * expanded — reference osmdata.py:192 TODO). With
    * `expandSuperRelations` on, only NODE members disqualify: relation
    * members are legal because [[expandMembers]] flattens them to ways
    * before assembly. */
  def relGeomClass(tags: Column, members: Column,
      expandSuperRelations: Boolean = false): Column = {
    val disqualified =
      if (expandSuperRelations) exists(members, m => m.getField("mtype") === TypeNode)
      else exists(members, m => m.getField("mtype") =!= TypeWay)
    val t = try_element_at(tags, lit("type"))
    when(size(members) === 0 || disqualified, 0)
      .when(t.isin(RelationLine.map(v => v: Any): _*), 2)
      .when(t.isin(RelationArea.map(v => v: Any): _*), 3)
      .otherwise(0)
  }

  /** Opt-in super-relation expansion (the reference's documented TODO,
    * osmdata.py:192): relation members of a geometry relation are
    * recursively replaced by THEIR members, `depth` joins against the
    * unfiltered relation pass. Semantics:
    *  - member ORDER is hierarchical: a zero-padded position path
    *    ("00003.00001.00007") sorts expanded members where the
    *    sub-relation sat in its parent, then renumbers to a dense
    *    integer mpos for the assembler;
    *  - member ways take the SUB-relation's roles (a sub-boundary's
    *    inner/outer assignment is authoritative; its own membership
    *    role in the parent is not);
    *  - node members are ignored at every level, like the unexpanded
    *    path; relations deeper than `depth` are dropped (bounded work,
    *    and the bound also terminates membership cycles, which exist
    *    in real planet files);
    *  - a way or sub-relation reachable through MULTIPLE paths (diamond
    *    membership, cycles) is kept once per (root, ref) at its
    *    smallest path — without this, a 2-cycle would duplicate every
    *    ring below it.
    * Scale: each level is one equi-join of the (small) frontier against
    * the relation table plus a posexplode — no driver recursion; the
    * final renumbering window partitions by root relation id whose
    * groups are member lists, bounded like every other per-relation
    * structure. */
  private[osm] def expandMembers(exploded: DataFrame, all: DataFrame,
      depth: Int): DataFrame = {
    val allRels = all.filter(col("type") === TypeRelation)
      .select(col("id").as("sub_id"), col("members").as("sub_members"))
    val withPath = exploded.select(col("rel_id"), col("gclass"),
      format_string("%05d", col("mpos")).as("path"),
      col("m.role").as("role"), col("m.mtype").as("mtype"), col("m.ref").as("ref"))
    // keep one row per (root, ref), at the smallest path; struct min is
    // deterministic (path, then role)
    def dedup(df: DataFrame): DataFrame = df
      .groupBy(col("rel_id"), col("gclass"), col("ref"))
      .agg(min(struct(col("path"), col("role"))).as("pr"))
      .select(col("rel_id"), col("gclass"), col("pr.path").as("path"),
        col("pr.role").as("role"), col("ref"))
    var ways = withPath.filter(col("mtype") === TypeWay)
      .select(col("rel_id"), col("gclass"), col("path"), col("role"), col("ref"))
    var frontier = dedup(withPath.filter(col("mtype") === TypeRelation))
    (1 to depth).foreach { _ =>
      val sub = frontier
        .join(allRels, col("ref") === col("sub_id"))
        .select(col("rel_id"), col("gclass"), col("path").as("ppath"),
          posexplode(col("sub_members")).as(Seq("sub_pos", "sm")))
        .select(col("rel_id"), col("gclass"),
          concat(col("ppath"), lit("."),
            format_string("%05d", col("sub_pos"))).as("path"),
          col("sm.role").as("role"), col("sm.mtype").as("mtype"),
          col("sm.ref").as("ref"))
      ways = ways.union(sub.filter(col("mtype") === TypeWay)
        .select(col("rel_id"), col("gclass"), col("path"), col("role"), col("ref")))
      frontier = dedup(sub.filter(col("mtype") === TypeRelation))
    }
    import org.apache.spark.sql.expressions.Window
    // Duplicate DIRECT membership (the same way listed at two
    // positions, e.g. an out-and-back route) is legal and preserved —
    // the unexpanded path keeps both rows, so expansion must not
    // rewrite relations that have no sub-relations at all. The
    // (root, ref) dedup is the diamond/cycle guard and applies only to
    // rows reached THROUGH expansion (path contains '.'); an expanded
    // ref already present as a direct member is suppressed entirely.
    val direct = ways.filter(!col("path").contains("."))
    val expanded = dedup(ways.filter(col("path").contains(".")))
      .join(direct.select(col("rel_id").as("d_rel"), col("ref").as("d_ref"))
          .distinct(),
        col("rel_id") === col("d_rel") && col("ref") === col("d_ref"),
        "left_anti")
    direct.unionByName(expanded)
      .withColumn("mpos", row_number().over(
        Window.partitionBy("rel_id").orderBy("path")) - 1)
      .select(col("rel_id"), col("gclass"), col("mpos"), col("role"),
        col("ref").as("wref"))
  }

  // ------------------------------------------------------------------

  def run(spark: SparkSession, path: String, q: OsmQuery): DataFrame = {
    val all = scan(spark, path)
    // must-tag pushdown (F3): the filtered-element branch decodes only
    // elements whose keys intersect the query's must set — the check
    // runs on string ids inside the blob decoder, and blobs whose
    // string table lacks every key are skipped outright. The node
    // coordinate / member-way branches keep the unfiltered scan. The
    // Column-level must predicate still re-checks (free, and keeps the
    // cached-DataFrame path semantics identical).
    val elSource =
      if (q.mustTags.nonEmpty) {
        val opts = Map("mustTagKeys" -> q.mustTags.mkString("\u0001"))
        dedupMultiFile(spark.read.format("osmpbf")
          .options(opts).load(path), path, opts)
      } else all
    runImpl(spark, elSource, all, q)
  }

  /** Run against a pre-built element DataFrame — pass a `.persist()`ed
    * scan to get the reference's cache semantics (one decode, many
    * queries; reference osmdata.py caches, SURVEY §4.3 delta 2): every
    * branch (filtered elements, node coords, member ways) derives from
    * the same source, so a persisted source is decoded exactly once. */
  def run(spark: SparkSession, all: DataFrame, q: OsmQuery): DataFrame =
    runImpl(spark, all, all, q)

  /** @param elSource the scan feeding the filtered-element branch (may
    *   carry must-tag pushdown); `all` feeds the coordinate and
    *   member-way branches. */
  private def runImpl(spark: SparkSession, elSource: DataFrame, all: DataFrame,
      q: OsmQuery): DataFrame = {

    val typeCond = {
      val wanted = Seq(TypeNode -> q.nodes, TypeWay -> q.ways, TypeRelation -> q.relations)
        .collect { case (t, true) => t }
      require(wanted.nonEmpty, "query must select at least one of nodes/ways/relations")
      col("type").isin(wanted.map(t => t: Any): _*)
    }
    val idSets = Seq(q.nodeIds.map(TypeNode -> _), q.wayIds.map(TypeWay -> _)).flatten
    val smallIdSets = idSets.forall(_._2.size <= LargeIdSetThreshold)
    val idCond = {
      // F2 small-set path: literal isin, pushed into the scan. Large
      // sets switch to a broadcast semi-join below (a million-literal
      // In expression explodes the plan; SURVEY §2.2 F2).
      if (idSets.isEmpty || !smallIdSets) lit(true)
      else {
        val conds = idSets.map { case (t, ids) =>
          col("type") === t && col("id").isin(ids.map(i => i: Any): _*)
        }
        // element types without an id set stay unrestricted
        conds.reduce(_ || _) || !col("type").isin(idSets.map(_._1: Any): _*)
      }
    }
    val relTypeCond = q.relationType match {
      case Some(ts) => col("type") =!= TypeRelation ||
        coalesce(try_element_at(col("tags"), lit("type")).isin(ts.map(v => v: Any): _*), lit(false))
      case None => lit(true)
    }

    var el = elSource.filter(typeCond && idCond && relTypeCond && tagPredicate(q, col("tags")))
    if (idSets.nonEmpty && !smallIdSets) {
      // F2 large-set path: broadcast left-semi join on (type, id) for
      // the restricted types; unrestricted types pass through
      import spark.implicits._
      val idsDf = broadcast(
        idSets.flatMap { case (t, ids) => ids.map(id => (id, t)) }
          .toDF("id", "type"))
      val restrictedTypes = idSets.map(_._1)
      val restricted = el
        .filter(col("type").isin(restrictedTypes.map(t => t: Any): _*))
        .join(idsDf, Seq("id", "type"), "left_semi")
      val unrestricted = el
        .filter(!col("type").isin(restrictedTypes.map(t => t: Any): _*))
      el = restricted.unionByName(unrestricted)
    }
    // min-points way filter (reference primitives.py:76-78) — geometry
    // queries drop degenerate ways before the coordinate join
    if (q.geometry) el = el.filter(col("type") =!= TypeWay || size(col("refs")) >= 2)

    val nodes = all.filter(col("type") === TypeNode)
      .select(col("id").as("nid"), col("lon"), col("lat"))
    val result =
      if (q.topology) {
        // The walk and the attribute projection both read the filtered
        // ways — two scans of the same source. Sharing them through a
        // lazy localCheckpoint (spark.graft.osm.topoShare=true) was
        // MEASURED AND REJECTED as the default (r22 addendum): a
        // topology query's tag filter keeps most ways, so the
        // checkpoint materializes selection≈corpus way rows (refs
        // arrays + tags maps) through the block manager — at the
        // 7M-node probe that cost 2× the phase (topology_s 4.3 vs 2.2,
        // same host epoch) while the attrs re-scan it replaces decodes
        // only tags from compressed blobs and prunes refs. The share
        // stays as an A/B arm for extracts whose filter IS selective;
        // passing the checkpoint as `attrs` is exact (the inner join
        // on segment way ids re-implies the dropped superset rows).
        val share = spark.conf
          .get("spark.graft.osm.topoShare", "false").toBoolean
        if (share) {
          val waysC = el.filter(col("type") === TypeWay)
            .localCheckpoint(eager = false)
          Topology.build(spark, waysC, waysC, nodes)
        } else Topology.build(spark, el,
          elSource.filter(col("type") === TypeWay), nodes)
      }
      else if (q.geometry) GeometryBuilder.build(spark, all, el, q, nodes)
      else el

    project(result, q)
  }

  /** Hard ceiling on the number of distinct tag keys [[pivotTags]] will
    * collect to the driver, configurable via
    * `spark.graft.pivot.maxKeys`. The vocabulary-bounded argument below
    * holds for curated queries, but a hostile or dirty extract
    * (real planet files carry `tiger:*`/`gnis:*` per-element key
    * explosions) can make distinct-key cardinality O(elements); the cap
    * turns a silent driver OOM into a loud, actionable error
    * (VERDICT r10 task 4). */
  private[graft] val DefaultPivotMaxKeys = 10000

  /** Dynamic tag pivot (reference _frame.py:59-68 unstack semantics):
    * discover the keys occurring in a result's `tags` map at action
    * time and project one column per key (sorted) in the map column's
    * place. The driver-side collect is of distinct key STRINGS of the
    * already-filtered result only — bounded by the tag vocabulary
    * (~10⁴ keys in active OSM use), not the corpus — and defensively
    * capped at `spark.graft.pivot.maxKeys` (default 10k): keys are
    * collected through a `limit(cap + 1)`, so a key-explosion extract
    * fails fast with at most cap+1 strings on the driver instead of
    * OOMing it. */
  def pivotTags(base: DataFrame): DataFrame = {
    require(base.columns.contains("tags"), "pivotTags needs a `tags` map column")
    val maxKeys = {
      val raw = base.sparkSession.conf
        .get("spark.graft.pivot.maxKeys", DefaultPivotMaxKeys.toString)
      val v =
        try raw.trim.toInt
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.pivot.maxKeys must be an integer, got '$raw'", e)
        }
      if (v <= 0) Int.MaxValue else v
    }
    // collect THROUGH a limit of maxKeys+1: driver memory stays bounded
    // by the cap even when the extract carries millions of distinct
    // keys, and overflow detection costs no second job (guard the +1
    // against Int overflow when the cap is disabled)
    val probeLimit = if (maxKeys == Int.MaxValue) Int.MaxValue else maxKeys + 1
    val collected = base.select(explode(map_keys(col("tags"))).as("k"))
      .distinct().limit(probeLimit).collect()
    if (collected.length > maxKeys) throw new IllegalStateException(
      s"pivotTags: result has more than $maxKeys distinct tag keys — " +
        "pivoting would create that many columns and collect every key " +
        "string to the driver. Filter tags first (keep/exclude/tag " +
        "projection) or raise spark.graft.pivot.maxKeys explicitly.")
    val keys = collected.map(_.getString(0)).sorted
    val cols = base.columns.toSeq.flatMap {
      case "tags" => keys.map(k => try_element_at(col("tags"), lit(k)).as(k))
      case c => Seq(col(c))
    }
    base.select(cols: _*)
  }

  /** The "geometry cache" equivalent: the node coordinate table
    * (reference osmdata.py:127-133) — a pruned parallel scan instead of
    * a driver-RAM array; persist() it for repeated queries. */
  def nodeCoords(spark: SparkSession, path: String): DataFrame =
    scan(spark, path)
      .filter(col("type") === TypeNode)
      .select(col("id").as("nid"), col("lon"), col("lat"))

  /** Result-shape projection (reference _frame.py:8-57 to_dataframe):
    * osmid, osmtype, tag columns per the projection mode, optional
    * metadata, optional geometry/topology columns. */
  private def project(df: DataFrame, q: OsmQuery): DataFrame = {
    val base = Seq(col("id").as("osmid"), col("type").as("osmtype"))
    val tagCols = q.tags match {
      case None => Seq(col("tags"))
      case Some(ks) => ks.map(k => try_element_at(col("tags"), lit(k)).as(k))
    }
    val metaCols =
      if (q.metadata) Seq(col("version"), col("timestamp"), col("changeset"))
      else Nil
    val geomCols =
      if (q.topology) Seq(col("source"), col("target"), col("geometry"), col("geom_type"))
      else if (q.geometry) Seq(col("geometry"), col("geom_type"))
      else Nil
    df.select(base ++ tagCols ++ metaCols ++ geomCols: _*)
  }
}

/** Geometry assembly: points (G1), way linestrings/polygons (G2/G3 via
  * the R7 heuristic), relation multipolygon/route assembly
  * (G5-G8, J3-J6). */
object GeometryBuilder {

  import OsmQueryExec._
  import graft.sources.OsmPbfSource.{TypeNode, TypeRelation, TypeWay}

  private[osm] case class GeomRow(id: Long, geometry: Array[Byte], geom_type: String)

  /** Conf: broadcast the exploded way-ref rows into the coordinate
    * join when their MEASURED count is at or below this (rows);
    * 0 disables the broadcast tier. See [[coordJoin]]. */
  val RefsBroadcastRowsKey = "spark.graft.geom.refsBroadcastRows"

  /** Attach node coordinates to exploded (…, ref) way-ref rows —
    * the geometry path's one big join — choosing the strategy from the
    * MEASURED exploded size, not an estimate. The exploded rows are
    * lazily localCheckpoint'ed (the count() here is the materializing
    * action, and the join consumes the same blocks — nothing runs
    * twice), then:
    *  - small side (≤ [[RefsBroadcastRowsKey]] rows, default 4M ≈
    *    ~200 MB hashed): BROADCAST the refs. This removes BOTH
    *    exchanges — the multi-million-row node table streams straight
    *    out of the pruned scan with no shuffle at all (measured at the
    *    2M-node world: 12.8 → 2.7 CPU-s steady state for the join
    *    stage). The reference's workload is exactly this shape: a city
    *    extract whose wanted-way refs are a few MB.
    *  - large side: scale-safe SHUFFLE_HASH, unchanged — a
    *    planet-scale corpus exceeds any sane broadcast and pays the
    *    two exchanges it genuinely needs (no sort of either side; the
    *    per-way walk repartitions by way id right after).
    * The scan's own planner statistics cannot drive this choice: they
    * deliberately overestimate (safe for suppressing broadcasts of the
    * whole scan) and say nothing about the post-filter ref volume.
    *
    * Observed crossover (round 19, CoordJoinProbe — VERDICT r18
    * task 8, bench/coordjoin_probe_r19.json; per-rep min-wall
    * shuffle, strategy read from the POST-execution adaptive plan):
    * at the 2M-node / 100k-way BigWorld the highways-geometry
    * workload explodes ~0.6M refs → broadcast tier, ~2.3 s wall,
    * ~8 MB shuffle (the per-way walk's repartition; the join itself
    * exchanges nothing). At the 10× world (20M nodes / 1M ways) the
    * ~6M exploded refs cross the 4M threshold → SHUFFLE_HASH holds
    * (AQE does not convert it back at runtime), ~6.7 s wall, ~413 MB
    * shuffle — 10× the data at ~3× the wall, the sublinear scaling
    * the threshold design predicts. The probe exits 1 if either side
    * of the crossover ever plans the other strategy. */
  private[osm] def coordJoin(spark: SparkSession, exploded: DataFrame,
      nodes: DataFrame): DataFrame = {
    val expC = exploded.localCheckpoint(eager = false)
    val n = expC.count()
    val raw = spark.conf.get(RefsBroadcastRowsKey, "4000000")
    val threshold =
      try raw.trim.toLong
      catch {
        case e: NumberFormatException => throw new IllegalArgumentException(
          s"$RefsBroadcastRowsKey must be a row count, got '$raw'", e)
      }
    if (n <= threshold) broadcast(expC).join(nodes, col("ref") === col("nid"))
    else expC.hint("shuffle_hash").join(nodes, col("ref") === col("nid"))
  }

  /** @param el filtered elements (nodes/ways/relations per query)
    * @param nodes full node coordinate table (nid, lon, lat) */
  def build(spark: SparkSession, all: DataFrame, el: DataFrame, q: OsmQuery,
      nodes: DataFrame): DataFrame = {
    import spark.implicits._

    val carry = Seq("id", "type", "tags", "version", "timestamp", "changeset")

    // Only plan the branches the query selects — each branch triggers
    // its own (pruned) scans, so an unused branch is pure waste.
    val branches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    // G1 — node points: pure expression, no shuffle at all
    if (q.nodes) branches += el.filter(col("type") === TypeNode)
      .withColumn("geometry", pointWkb(col("lon"), col("lat")))
      .withColumn("geom_type", lit("Point"))
      .select(carry.map(col) :+ col("geometry") :+ col("geom_type"): _*)

    // G2/G3 — way geometry: explode refs, join coords, assemble per way.
    // repartition + sortWithinPartitions + a streaming per-way walk
    // does the same grouping as groupByKey with one sort and no
    // per-group iterator machinery (same pattern as Topology.build —
    // way size is bounded by the 2000-node OSM cap, so a run always
    // fits in memory). The coordinate join's strategy (broadcast the
    // refs vs shuffle_hash) is chosen from the measured exploded size
    // in [[coordJoin]].
    if (q.ways || q.relations) {
    val ways = el.filter(col("type") === TypeWay)

    if (!q.relations) {
      // ways-only query: explode the filtered ways' own refs directly.
      // The filtered ways also feed the final attribute join — a
      // second pruned scan (refs pruned off it), deliberately NOT a
      // shared checkpoint: the topoShare A/B at the 7M probe showed
      // materializing near-corpus way rows costs more than the pruned
      // re-decode (see runImpl's topology note).
      val wayGeoms: DataFrame = {
        val exploded = coordJoin(spark,
          ways.withColumn("is_area", wayIsArea(col("tags"), col("refs")))
            .select(col("id"), col("is_area"), posexplode(col("refs")).as(Seq("pos", "ref"))),
          nodes)
          .select(col("id"), col("is_area"), col("pos"), col("lon"), col("lat"))
        exploded.as[(Long, Boolean, Int, Double, Double)]
          .repartition(col("id"))
          .sortWithinPartitions("id", "pos")
          .mapPartitions { it =>
            val in = it.buffered
            new Iterator[GeomRow] {
              override def hasNext: Boolean = in.hasNext
              override def next(): GeomRow = {
                val wid = in.head._1
                val rows = ArrayBuffer.empty[(Long, Boolean, Int, Double, Double)]
                while (in.hasNext && in.head._1 == wid) rows += in.next()
                val coords = rows.map(r => Coord(r._4, r._5)).toSeq
                val isArea = rows.head._2
                if (isArea) {
                  val ring = if (coords.head == coords.last) coords else coords :+ coords.head
                  GeomRow(wid, Wkb.polygon(Seq(ring)), "Polygon")
                } else GeomRow(wid, Wkb.lineString(coords), "LineString")
              }
            }
          }
          .toDF("id", "geometry", "geom_type")
      }
      branches += ways.drop("geometry", "geom_type")
        .join(wayGeoms.withColumnRenamed("id", "gid"), col("id") === col("gid"))
        .select(carry.map(col) :+ col("geometry") :+ col("geom_type"): _*)
    } else {
    // G5-G8 — relation geometry via member-way expansion (J3: a second
    // pruned scan of ways replaces the reference's second query pass,
    // reference osmdata.py:194-206).
    // The filtered-element table is consumed ~5× on this path (way
    // areas, way rows, wanted ids, members, relation rows) and each
    // consumer re-executes the must-tag scan; it is small by
    // construction (elements passing the query's must filter), so a
    // lazy local checkpoint decodes it once.
    val elC = el.localCheckpoint(eager = false)
    val elWays = elC.filter(col("type") === TypeWay)
    val rels = elC.filter(col("type") === TypeRelation)
      .withColumn("gclass",
        relGeomClass(col("tags"), col("members"), q.expandSuperRelations))
    val geomRels = rels.filter(col("gclass").isin(2, 3))

    val exploded = geomRels
      .select(col("id").as("rel_id"), col("gclass"),
        posexplode(col("members")).as(Seq("mpos", "m")))
    val members =
      if (!q.expandSuperRelations)
        exploded.filter(col("m.mtype") === TypeWay)
          .select(col("rel_id"), col("gclass"), col("mpos"),
            col("m.role").as("role"), col("m.ref").as("wref"))
      else expandMembers(exploded, all, q.superRelationDepth)

    // member ways may be outside the filtered set → unfiltered way pass
    // over the same source (a pruned re-scan, or free if persisted)
    val allWays = all
      .filter(col("type") === TypeWay)
      .select(col("id").as("wid"), col("refs"))

    // distinct member-way ids, shared by the semi-join below and the
    // J6 anti-join (one plan, not two copies of the explode+distinct)
    val memberWayIds = members.select(col("wref")).distinct()

    // ONE ordered-node-sequence build serves BOTH the standalone-way
    // WKB and the relation member assembly: the former plan ran the
    // explode ⋈ nodes ⋈ walk pipeline twice (el ways and member ways
    // separately), which cost a second full node-table scan + shuffle
    // — the single most expensive stage of the buildings query at the
    // 7M-node probe. Ids are the union of the filtered ways and the
    // members; refs come from the shared unfiltered way pass. The
    // result is lazily localCheckpoint'ed below: two consumers of one
    // DataFrame otherwise re-execute its whole subtree (Catalyst does
    // not reliably reuse the exchange across the branches — measured
    // 55 CPU-s vs 35 without the checkpoint at the 2M world), and the
    // checkpointed table is tiny (one row per wanted way, arrays
    // bounded by the 2000-node OSM way cap).
    val wantedWayIds = memberWayIds.select(col("wref").as("wwid"))
      .union(elWays.select(col("id").as("wwid")))
      .distinct()

    val waySeqs = coordJoin(spark,
      allWays
        .join(wantedWayIds, col("wid") === col("wwid"), "left_semi")
        .select(col("wid"), posexplode(col("refs")).as(Seq("pos", "ref"))),
      nodes)
      .select(col("wid"), col("pos"), col("ref"), col("lon"), col("lat"))
      .as[(Long, Int, Long, Double, Double)]
      .repartition(col("wid"))
      .sortWithinPartitions("wid", "pos")
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[(Long, Array[Long], Array[Double], Array[Double])] {
          override def hasNext: Boolean = in.hasNext
          override def next(): (Long, Array[Long], Array[Double], Array[Double]) = {
            val wid = in.head._1
            val rows = ArrayBuffer.empty[(Long, Int, Long, Double, Double)]
            while (in.hasNext && in.head._1 == wid) rows += in.next()
            (wid, rows.map(_._3).toArray, rows.map(_._4).toArray, rows.map(_._5).toArray)
          }
        }
      }
      .toDF("wid", "node_ids", "xs", "ys")
      .localCheckpoint(eager = false)

    // standalone way WKB from the shared sequences (R7 is_area joined
    // from the filtered ways; a narrow map — same bytes as the direct
    // path's walk, pinned by the mini-world WKB oracle)
    val wayGeoms = elWays
      .select(col("id").as("aid"), wayIsArea(col("tags"), col("refs")).as("is_area"))
      .join(waySeqs, col("aid") === col("wid"))
      .select(col("aid"), col("is_area"), col("xs"), col("ys"))
      .as[(Long, Boolean, Array[Double], Array[Double])]
      .map { case (wid, isArea, xs, ys) =>
        val coords = xs.indices.map(i => Coord(xs(i), ys(i)))
        if (isArea) {
          val ring = if (coords.head == coords.last) coords else coords :+ coords.head
          GeomRow(wid, Wkb.polygon(Seq(ring)), "Polygon")
        } else GeomRow(wid, Wkb.lineString(coords), "LineString")
      }
      .toDF("id", "geometry", "geom_type")
    val wayRows = elWays.drop("geometry", "geom_type")
      .join(wayGeoms.withColumnRenamed("id", "gid"), col("id") === col("gid"))
      .select(carry.map(col) :+ col("geometry") :+ col("geom_type"): _*)

    val memberWays = members
      .join(waySeqs, col("wref") === col("wid"))
      .select(col("rel_id"), col("gclass"), col("mpos"), col("role"),
        col("node_ids"), col("xs"), col("ys"))

    val relGeoms = memberWays
      .as[(Long, Int, Int, String, Array[Long], Array[Double], Array[Double])]
      .repartition(col("rel_id"))
      .sortWithinPartitions("rel_id", "mpos")
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[GeomRow] {
          override def hasNext: Boolean = in.hasNext
          override def next(): GeomRow = {
            val relId = in.head._1
            val ms = ArrayBuffer.empty[(Long, Int, Int, String, Array[Long], Array[Double], Array[Double])]
            while (in.hasNext && in.head._1 == relId) ms += in.next()
            assembleRelation(relId, ms.head._2,
              ms.map(m => Member(m._4, m._5, m._6, m._7)).toArray)
          }
        }
      }
      .toDF("id", "geometry", "geom_type")

    val relRows = geomRels.drop("gclass")
      .join(relGeoms.withColumnRenamed("id", "gid"), col("id") === col("gid"))
      .select(carry.map(col) :+ col("geometry") :+ col("geom_type"): _*)

    // J6 — drop standalone result ways that are members of result
    // geometry relations (reference _frame.py:27-28 anti-join)
    if (q.ways)
      branches += wayRows.join(memberWayIds,
        wayRows("id") === memberWayIds("wref"), "left_anti")
    branches += relRows
    }
    }

    branches.reduce(_.unionByName(_))
  }

  /** WKB point via the native codegen'd [[graft.functions.PointWkb]]
    * expression — per-node work (millions of rows on a city extract)
    * stays inside whole-stage codegen; ways/relations assemble inside
    * typed mapGroups instead. */
  private def pointWkb(lon: Column, lat: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(graft.functions.PointWkb(
      GraftExpressionBridge.expression(lon), GraftExpressionBridge.expression(lat)))
  }

  private[osm] case class Member(role: String, nodeIds: Array[Long],
      xs: Array[Double], ys: Array[Double])

  /** Greedy ring chaining per relation (G6, reference _frame.py:181-215)
    * + simple-area expansion (G5), ring closure (G8), duplicate junction
    * drop (G9), complex-ring drop (G7), polygon/multipolygon assembly
    * (G3/G4). Runs per relation group — member counts are small. */
  private[osm] def assembleRelation(relId: Long, gclass: Int, ms: Array[Member]): GeomRow = {
    if (gclass == 2) {
      // route: chain members into lines (no closure)
      val chains = chain(ms, close = false)
      val lines = chains.map(c => Wkb.lineString(c.map(p => Coord(p._2, p._3))))
      if (lines.length == 1) GeomRow(relId, lines.head, "LineString")
      else GeomRow(relId, Wkb.multiLineString(lines), "MultiLineString")
    } else {
      // area: simple-role members are their own rings (G5); outer/inner
      // chained within role (G6)
      val (simple, complex) = ms.partition(m => m.role != "outer" && m.role != "inner")
      val simpleRings = simple.map(m => closeRing(m.nodeIds.zip(m.xs.zip(m.ys))
        .map { case (n, (x, y)) => (n, x, y) }.toSeq))
      val outerRings = chain(complex.filter(_.role == "outer"), close = true)
      val innerRings = chain(complex.filter(_.role == "inner"), close = true)
      val outers = (simpleRings ++ outerRings).map(r => r.map(p => Coord(p._2, p._3)))
      val inners = innerRings.map(r => r.map(p => Coord(p._2, p._3)))
      if (outers.isEmpty) GeomRow(relId, Wkb.multiPolygon(Nil), "MultiPolygon")
      else if (outers.length == 1)
        GeomRow(relId, Wkb.polygon(outers.head +: inners), "Polygon")
      else
        // >1 outer: inner rings dropped (documented limitation G7,
        // reference _frame.py:234-244, README.md:31)
        GeomRow(relId, Wkb.multiPolygon(outers.map(o => Wkb.polygon(Seq(o)))), "MultiPolygon")
    }
  }

  private[osm] def closeRing(pts: Seq[(Long, Double, Double)]): Seq[(Long, Double, Double)] =
    if (pts.length >= 2 && pts.head._1 == pts.last._1) pts else pts :+ pts.head

  /** Greedy end-to-end chaining with reversal (reference _frame.py:181-215):
    * matching is by node id; the shared junction node of consecutive
    * ways is emitted once (G9). Like the reference, the chain extends
    * only at the TAIL (forward `_s == node` or reversed `_t == node`)
    * — complete for closed rings; an open route whose member order
    * starts mid-route may split into extra parts, exactly as the
    * reference's greedy does.
    *
    * Each greedy pick is "the first still-unused member (in original
    * member order) whose HEAD matches the chain tail, else the first
    * whose TAIL matches". Endpoint indexes (node id → ordered unused
    * member indices) make that pick O(log k) instead of an O(k) scan,
    * so a pathological 5-10k-member boundary relation — real OSM
    * admin boundaries get this big — costs O(nodes + k log k) per
    * relation group rather than O(k²); output order is byte-identical
    * to the scan form (pinned by RingChainSpec's equivalence
    * property). The per-relation group remains sequential by
    * necessity, exactly as the reference's per-relation loop. */
  private[osm] def chain(ms: Array[Member], close: Boolean): Seq[Seq[(Long, Double, Double)]] = {
    val seqs: Array[Seq[(Long, Double, Double)]] = ms.map(m =>
      m.nodeIds.zip(m.xs.zip(m.ys)).map { case (n, (x, y)) => (n, x, y) }.toSeq)
    val used = new Array[Boolean](seqs.length)
    val byHead = new java.util.HashMap[Long, java.util.TreeSet[Integer]]()
    val byLast = new java.util.HashMap[Long, java.util.TreeSet[Integer]]()
    def put(m: java.util.HashMap[Long, java.util.TreeSet[Integer]], k: Long, i: Int): Unit =
      m.computeIfAbsent(k, _ => new java.util.TreeSet[Integer]()).add(i)
    seqs.indices.foreach { i =>
      if (seqs(i).nonEmpty) { put(byHead, seqs(i).head._1, i); put(byLast, seqs(i).last._1, i) }
    }
    // smallest unused index under `k`, pruning spent entries lazily
    // (an index stays in the OTHER endpoint's set after use)
    def take(m: java.util.HashMap[Long, java.util.TreeSet[Integer]], k: Long): Int = {
      val ts = m.get(k)
      if (ts == null) return -1
      while (!ts.isEmpty && used(ts.first())) ts.pollFirst()
      if (ts.isEmpty) { m.remove(k); -1 } else ts.first()
    }
    val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Double, Double)]]
    var start = 0
    while (start < seqs.length) {
      if (!used(start)) {
        used(start) = true
        val ring = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
        ring ++= seqs(start)
        var extended = true
        while (extended && ring.nonEmpty && ring.head._1 != ring.last._1) {
          extended = false
          val endId = ring.last._1
          val hi = take(byHead, endId)
          if (hi >= 0) {
            used(hi) = true; ring ++= seqs(hi).tail; extended = true
          } else {
            val li = take(byLast, endId)
            if (li >= 0) {
              used(li) = true; ring ++= seqs(li).reverse.tail; extended = true
            }
          }
        }
        rings += (if (close) closeRing(ring.toSeq) else ring.toSeq)
      }
      start += 1
    }
    rings.toSeq
  }
}

/** G10/G11 — highway topology: split way node chains at shared nodes,
  * emit per-segment source/target + linestring geometry
  * (reference _frame.py:261-296). */
object Topology {

  /** @param el filtered elements — the ways whose chains are walked
    * @param attrs attribute rows for the final per-segment projection:
    *   a SUPERSET of el's ways from the same scan, minus the tag/size/id
    *   predicates (the inner join on segment way ids re-implies them
    *   exactly). Passing the unfiltered rows lets Catalyst prune `refs`
    *   off that second pbf scan — only the walk branch decodes refs.
    * @param nodes full node coordinate table (nid, lon, lat) */
  def build(spark: SparkSession, el: DataFrame, attrs: DataFrame,
      nodes: DataFrame): DataFrame = {
    import spark.implicits._

    val ways = el.filter(col("type") === graft.sources.OsmPbfSource.TypeWay)
    val exploded = ways
      .select(col("id").as("way"), posexplode(col("refs")).as(Seq("pos", "node")))

    // junction = node occurring more than once across all exploded rows
    // (reference _frame.py:272 pandas duplicated(keep=False)). One
    // aggregation on `node` carries BOTH the degree count and the
    // (way, pos) occurrence list, so the coordinate lookup (J1) joins
    // at distinct-node volume (~0.6x the exploded rows on real road
    // networks) and the exploded table is never joined or re-read —
    // the former exploded ⋈ nodesPlus join at full exploded volume was
    // the single most expensive stage of this plan at the 7M-node
    // probe scale. Occurrence lists are bounded by node degree (a
    // handful even at junctions), so collect_list cannot skew.
    // LEFT join so refs to nodes absent from the extract (clipped
    // extracts) keep their rows — and their junction flag — with NaN
    // coordinates; the walk splits at them but drops them from segment
    // geometry, so no segment ever spans a missing junction.
    val byNode = exploded.groupBy("node").agg(
      collect_list(struct(col("way"), col("pos"))).as("wps"))
    val rows = byNode.join(nodes, col("node") === col("nid"), "left")
      .select(col("node"),
        coalesce(col("lon"), lit(Double.NaN)).as("lon"),
        coalesce(col("lat"), lit(Double.NaN)).as("lat"),
        (size(col("wps")) >= 2).as("junction"),
        explode(col("wps")).as("wp"))
      .select(col("wp.way").as("way"), col("wp.pos").as("pos"),
        col("node"), col("lon"), col("lat"), col("junction"))

    // One shuffle on `way` replaces the former window + junction-row
    // explode + per-segment regroup: a way is ≤ 2000 nodes (OSM cap),
    // so the whole chain walks in memory — interior junctions close
    // the running segment and start the next one at the same node
    // (reference _frame.py:267-296 semantics; segments with < 2 nodes
    // dropped as before). repartition+sortWithinPartitions then a
    // streaming per-way walk does the same grouping as groupByKey with
    // one sort and no per-group iterator machinery (~20M rows at the
    // 7M-node scale — object overhead is the binding cost here).
    val segGeoms = rows
      .repartition(col("way"))
      .sortWithinPartitions("way", "pos")
      .as[(Long, Int, Long, Double, Double, Boolean)]
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[Seq[(Long, Long, Long, Long, Array[Byte], String)]] {
          override def hasNext: Boolean = in.hasNext
          override def next(): Seq[(Long, Long, Long, Long, Array[Byte], String)] = {
            val way = in.head._1
            val ns = ArrayBuffer.empty[(Long, Int, Long, Double, Double, Boolean)]
            while (in.hasNext && in.head._1 == way) ns += in.next()
            val out = Seq.newBuilder[(Long, Long, Long, Long, Array[Byte], String)]
            var segIx = 0L
            var start = 0
            var i = 1
            while (i < ns.length) {
              val boundary = i == ns.length - 1 || ns(i)._6 // last node or interior junction
              if (boundary) {
                if (i > start) {
                  // nodes missing from the extract (NaN coords) are
                  // dropped from the geometry; a segment needs >= 2
                  // present nodes to exist
                  val present = (start to i).filter(j => !ns(j)._4.isNaN)
                  if (present.length >= 2) {
                    val coords = present.map(j => Coord(ns(j)._4, ns(j)._5))
                    out += ((way, segIx, ns(present.head)._3, ns(present.last)._3,
                      Wkb.lineString(coords), "LineString"))
                    segIx += 1
                  }
                }
                start = i
              }
              i += 1
            }
            out.result()
          }
        }.flatten
      }
      .toDF("way", "seg_ix", "source", "target", "geometry", "geom_type")

    // dropDuplicates guards the malformed-input edge where one FILE
    // carries the same way id twice and only one copy passes the tag
    // filter — without it the unfiltered attrs side would attach both
    // copies. Arbitrary-wins is exact for the normal identical-copy
    // case (same doctrine as dedupMultiFile), and the aggregate lands
    // on the join's own hash(id) exchange, so it costs no extra shuffle.
    attrs.dropDuplicates("id")
      .join(segGeoms, attrs("id") === segGeoms("way"))
      .drop("way")
  }
}
