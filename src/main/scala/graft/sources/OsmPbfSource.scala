package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.pbf._

/** Spark DataSource V2 for `.osm.pbf` files:
  * `spark.read.format("graft.sources.osmpbf").load(path)`.
  *
  * Design (SURVEY §1.4, §3.1): the reference reads blobs sequentially on
  * one thread (reference osmdata.py:95-125); here the driver only frames
  * the file (4-byte length + ~50-byte BlobHeader per 1-32 MB blob, via
  * seeks) and OSMData blobs are packed into InputPartitions with
  * Spark's FilePartition split formula (maxPartitionBytes cap,
  * openCost padding, bytes-per-core floor), so decompression + decode
  * run fully parallel across executors without creating one task per
  * blob — a 100 TB corpus plans ~128 MB splits, not ~6M tasks.
  * At 100 TB the framing pass reads ~3 MB per 100 GB file.
  *
  * Pushdown:
  *  - `SupportsPushDownRequiredColumns` — skips protobuf field decode for
  *    unrequested columns (tags/refs/members/info), mirroring the
  *    reference's lazy decode (reference osmquery.py:325-333).
  *  - `SupportsPushDownFilters` — `type IN/= (...)` skips whole primitive
  *    groups before any element parse (reference osmquery.py:242-247);
  *    `id IN (...)` drops elements during decode, before row build
  *    (reference osmquery.py:262-276).
  */
object OsmPbfSource {
  val TypeNode: Byte = 0
  val TypeWay: Byte = 1
  val TypeRelation: Byte = 2

  /** Columns the vectorized (ColumnarBatch) read path emits. Array
    * columns (`refs`/`tags`/`members`) are row-path-only: the row
    * reader wraps each decoded long[] zero-copy in a GenericArrayData,
    * while a batch pays flat-buffer → vector → unsafe-row copies per
    * element when downstream operators (explode, map access) pull the
    * arrays back out. A conf-gated CSR refs/tags batch tier existed in
    * round 7 (default off on a measured ~40 % CPU regression for the
    * refs-exploding topology walk); round-8 warm-JVM A/Bs (TimeQuery,
    * both orders, topology/POIs/buildings) showed parity at best, so
    * the tier was retired — README "Columnar refs/tags tier" has the
    * numbers. Scalar-only scans (the 7M-row coordinate table, type
    * counts) keep the batch path, where it eliminates per-element
    * allocation outright. */
  val scalarCols: Set[String] =
    Set("id", "type", "lat", "lon", "version", "timestamp", "changeset")

  /** Per-type id-range scan restriction, as the `idRanges` source
    * option: `"t,lo,hi;t,lo,hi"` (t ∈ 0/1/2). A scan with ranges keeps
    * only blobs whose per-type id span (from the cached stats walk)
    * intersects a requested interval of a wanted type — blob-granular
    * PRUNING, not an element filter: a kept blob still emits all its
    * rows, the consumer re-applies the exact predicate (the same
    * conservative-recheck contract as the pushed filters). Serves the
    * multi-file border-dedup split, whose overlap intervals are
    * plan-time metadata. */
  def serializeIdRanges(rs: Seq[(Int, Long, Long)]): String =
    rs.map { case (t, lo, hi) => s"$t,$lo,$hi" }.mkString(";")

  def parseIdRanges(s: String): Seq[(Int, Long, Long)] =
    if (s == null || s.trim.isEmpty) Nil
    else s.split(';').toSeq.filter(_.nonEmpty).map { part =>
      val Array(t, lo, hi) = part.split(',')
      (t.trim.toInt, lo.trim.toLong, hi.trim.toLong)
    }

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("type", ByteType, nullable = false),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("refs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("members", ArrayType(StructType(Seq(
      StructField("role", StringType, nullable = false),
      StructField("ref", LongType, nullable = false),
      StructField("mtype", ByteType, nullable = false))), containsNull = false), nullable = false),
    StructField("version", IntegerType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("changeset", LongType, nullable = true)))
}

class OsmPbfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OsmPbfSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

class OsmPbfTable(path: String) extends Table with SupportsRead {
  require(path != null, "osm.pbf source requires .load(path)")
  override def name(): String = s"osmpbf:$path"
  override def schema(): StructType = OsmPbfSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(path,
      Option(options.get("mustTagKeys"))
        .map(_.split('\u0001').filter(_.nonEmpty)).orNull,
      OsmPbfSource.parseIdRanges(options.get("idRanges")))
}

class OsmPbfScanBuilder(path: String, mustTagKeys: Array[String] = null,
    idRanges: Seq[(Int, Long, Long)] = Nil)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = OsmPbfSource.schema
  private var wantTypes: Array[Boolean] = Array(true, true, true)
  private var idFilter: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty
  // (groupByType, number of COUNT(*) columns) once an agg is pushed
  private var pushedCounts: Option[(Boolean, Int)] = None

  /** Partial COUNT(*) [GROUP BY type] pushdown: per-partition counts
    * come from the blob framing walk alone — inflate + a field-tag byte
    * scan, no element decode (a DenseNodes group's count is its packed
    * id field's varint count). Spark plans the final merge agg on top,
    * so this composes with multi-partition scans. Only COUNT(*) with no
    * grouping or grouped exactly by `type` qualifies; any pushed filter
    * keeps the row path (Spark only offers aggregates when no post-scan
    * filter remains, and this source conservatively re-checks every
    * pushed filter post-scan). */
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (idFilter.nonEmpty || mustTagKeys != null || idRanges.nonEmpty ||
      !wantTypes.forall(identity)) return false
    val groupOk = aggregation.groupByExpressions.forall {
      case f: org.apache.spark.sql.connector.expressions.NamedReference =>
        f.fieldNames.length == 1 && f.fieldNames()(0) == "type"
      case _ => false
    }
    val aggs = aggregation.aggregateExpressions
    val aggsOk = aggs.nonEmpty && aggs.forall(
      _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar])
    if (!groupOk || !aggsOk) return false
    pushedCounts = Some((aggregation.groupByExpressions.nonEmpty, aggs.length))
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("type", _) | In("type", _) => true
      case In("id", _) | EqualTo("id", _) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("type", v: Any) =>
        val t = anyToByte(v)
        wantTypes = Array(t == 0, t == 1, t == 2)
      case In("type", vs) =>
        val ts = vs.map(anyToByte).toSet
        wantTypes = Array(ts.contains(0), ts.contains(1), ts.contains(2))
      case EqualTo("id", v: Any) => idFilter = Some(Set(anyToLong(v)))
      case In("id", vs) => idFilter = Some(vs.map(anyToLong).toSet)
      case _ =>
    }
    pushed = accepted
    // Conservatively keep pushed filters in the Spark plan too (exact
    // re-check is cheap; the win is skipped decode inside the scan).
    rest ++ accepted
  }

  private def anyToByte(v: Any): Byte = v match {
    case b: Byte => b
    case i: Int => i.toByte
    case l: Long => l.toByte
    case s: Short => s.toByte
    case other => other.toString.toByte
  }
  private def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => other.toString.toLong
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedCounts match {
    case Some((groupByType, nCounts)) => new OsmPbfCountScan(path, groupByType, nCounts)
    case None =>
      new OsmPbfScan(path, required, wantTypes, idFilter, mustTagKeys, idRanges)
  }
}

/** Scan produced when a COUNT(*) [GROUP BY type] aggregate is pushed:
  * emits per-partition partial counts with schema
  * `[type?] ++ count(*) ...` (group columns first, as the pushdown
  * contract requires); Spark's rewritten final aggregate sums them.
  *
  * Multi-file caveat: on a DIRECTORY of adjacent extracts, bare-scan
  * counts (`spark.read.format("osmpbf").load(dir).count()`) are RAW —
  * border elements duplicated across files are counted once per file,
  * same as the row path's bare-scan semantics have always been.
  * Deduplication happens ABOVE the scan (which blocks this pushdown):
  * `OsmFile.info()` and `OsmQueryExec.scan` are the deduped surfaces
  * for overlapping-extract corpora. */
class OsmPbfCountScan(path: String, groupByType: Boolean, nCounts: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    (if (groupByType) Seq(StructField("type", ByteType, nullable = false)) else Nil) ++
      (1 to nCounts).map(i => StructField(s"count_$i", LongType, nullable = false)))

  override def toBatch: Batch = this
  override def description(): String =
    s"OsmPbfCountScan(path=$path, groupBy=${if (groupByType) "type" else "<global>"})"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = OsmPbfScan.planPartitions(path, Array(true, true, true))
    // a header-only file has zero data blobs → zero partitions; the
    // global COUNT is rewritten to SUM of partials by the pushdown,
    // and SUM over no rows is null where COUNT must be 0 — keep one
    // empty partition so exactly one zero partial row is emitted
    if (parts.isEmpty) Array(OsmPbfPartition(Array.empty))
    else parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfCountReaderFactory(groupByType, nCounts)
}

class OsmPbfCountReaderFactory(groupByType: Boolean, nCounts: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OsmPbfCountReader(partition.asInstanceOf[OsmPbfPartition], groupByType, nCounts)
}

class OsmPbfCountReader(p: OsmPbfPartition, groupByType: Boolean, nCounts: Int)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    var n = 0L
    var w = 0L
    var r = 0L
    val blobReader = new graft.pbf.BlobReader(graft.pbf.OsmPbfFile.sharedConf)
    try p.blobs.foreach { b =>
      val (bn, bw, br) = OsmPbfFile.countTypes(blobReader.read(b))
      n += bn; w += bw; r += br
    } finally blobReader.close()
    if (groupByType) {
      // a type with zero elements in this partition contributes no
      // group row (groupBy emits no row for an absent key)
      Seq(OsmPbfSource.TypeNode -> n, OsmPbfSource.TypeWay -> w,
        OsmPbfSource.TypeRelation -> r)
        .filter(_._2 > 0L)
        .map { case (t, c) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            (t +: Seq.fill(nCounts)(c)).toArray[Any]): InternalRow
        }.iterator
    } else
      Iterator(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array.fill[Any](nCounts)(n + w + r)))
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class OsmPbfScan(path: String, required: StructType,
    wantTypes: Array[Boolean], idFilter: Option[Set[Long]],
    mustTagKeys: Array[String] = null,
    idRanges: Seq[(Int, Long, Long)] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Planner statistics from the blob index: without them a DSv2 scan
    * sizes as `defaultSizeInBytes` (effectively infinite) and Catalyst
    * can NEVER choose a broadcast join over this source — so a tiny
    * city extract's node table was shuffle-joined like a 100 TB one.
    * The estimate is the type-pruned compressed byte count times a
    * deliberately HIGH expansion factor: overestimation only costs a
    * broadcast opportunity, underestimation could broadcast something
    * enormous. Row count stays unknown (computing it costs a decode
    * pass; sizeInBytes is what the join planner keys on). */
  override def estimateStatistics(): Statistics = {
    val bytes = math.max(1L,
      OsmPbfScan.prunedBlobs(path, wantTypes, idRanges).map(_.dataLen.toLong).sum *
        OsmPbfScan.RowBytesPerCompressedByte)
    new Statistics {
      override def sizeInBytes: java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows: java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }
  override def description(): String = {
    val types = Seq("node", "way", "relation").zip(wantTypes)
      .collect { case (n, true) => n }.mkString(",")
    val must = if (mustTagKeys == null) ""
      else s", mustTags=${mustTagKeys.mkString("|")}"
    val rng = if (idRanges.isEmpty) ""
      else s", idRanges=${OsmPbfSource.serializeIdRanges(idRanges)}"
    s"OsmPbfScan(path=$path, types=$types, cols=${required.fieldNames.mkString(",")}$must$rng)"
  }

  override def planInputPartitions(): Array[InputPartition] =
    OsmPbfScan.planPartitions(path, wantTypes, idRanges)

  override def createReaderFactory(): PartitionReaderFactory = {
    // session kill-switch (`spark.graft.pbf.columnar=false`) for the
    // vectorized path: lets a deployment A/B the two decode paths on
    // its own workload, and is the gate the scalar path falls back
    // through if columnar ever loses at a given block shape.
    def confOn(key: String, default: String): Boolean =
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString(key, default).trim.equalsIgnoreCase("true")
    val eligible = required.fieldNames.forall(OsmPbfSource.scalarCols.contains)
    new OsmPbfReaderFactory(required, wantTypes,
      idFilter.map(_.toArray).orNull, mustTagKeys,
      columnar = eligible && confOn("spark.graft.pbf.columnar", "true"))
  }
}

object OsmPbfScan {
  /** UnsafeRow bytes per COMPRESSED blob byte assumed by the planner
    * statistics — deliberately conservative (high): zlib compresses the
    * delta-packed wire format ~2-4x on real extracts and the wire
    * format expands another ~3-6x when decoded into rows, so real
    * expansion is ~8-20x; synthetic grids compress far harder, but
    * overestimating only suppresses a broadcast (safe) while
    * underestimating could broadcast a huge side. */
  val RowBytesPerCompressedByte = 24L

  /** F10 — blob-level pruning: when a type filter is pushed, consult
    * (and lazily build, one parallel pass per file) the per-blob
    * element-type stats index and drop blobs that cannot contain
    * requested types (reference osmquery.py:242-247; the reference's
    * first-pass cache plays this role, SURVEY §4.1). Shared by
    * partition planning and the planner statistics. */
  def prunedBlobs(path: String, wantTypes: Array[Boolean],
      idRanges: Seq[(Int, Long, Long)] = Nil): Seq[BlobInfo] = {
    val blobs = OsmPbfFile.indexAll(path)
    if (wantTypes.forall(identity) && idRanges.isEmpty) blobs
    else {
      val stats = OsmPbfStats.ranges(path, blobs)
      blobs.zip(stats).collect {
        case (b, a) if blobIntersects(a, wantTypes, idRanges) => b
      }
    }
  }

  /** Keep a blob iff SOME wanted type is present in it AND (when id
    * ranges are given) that type's blob id span intersects a requested
    * interval — blob-granular, consumers re-check exactly. THE single
    * intersection convention (closed intervals), shared by partition
    * pruning above and the border-dedup blob-fraction decision
    * (OsmQueryExec.dedupMultiFile) so the two can never drift. */
  def blobIntersects(a: Array[Long], wantTypes: Array[Boolean],
      idRanges: Seq[(Int, Long, Long)]): Boolean =
    (0 to 2).exists { t =>
      wantTypes(t) && a(2 * t) <= a(2 * t + 1) && (idRanges.isEmpty ||
        idRanges.exists { case (rt, lo, hi) =>
          rt == t && lo <= a(2 * t + 1) && hi >= a(2 * t)
        })
    }

  /** Index, prune and pack the file's blobs into input partitions —
    * shared by the row, columnar and pushed-count scans. */
  def planPartitions(path: String, wantTypes: Array[Boolean],
      idRanges: Seq[(Int, Long, Long)] = Nil): Array[InputPartition] = {
    val pruned = prunedBlobs(path, wantTypes, idRanges)
    // Pack blobs into splits with Spark's FilePartition formula: a
    // 100 TB corpus is ~6M blobs — one task per blob would swamp the
    // scheduler, so consecutive blobs coalesce up to maxSplitBytes,
    // while the openCost padding keeps small files on separate tasks
    // (full parallelism for a single city extract on local[32]).
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val openCost = conf.filesOpenCostInBytes
    val bytesPerCore =
      pruned.map(_.dataLen.toLong + openCost).sum /
        math.max(org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism, 1)
    val maxSplit = math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))
    packBlobs(pruned, maxSplit, openCost)
      .map(bs => OsmPbfPartition(bs.toArray): InputPartition).toArray
  }

  /** Greedy split packing, same semantics as Spark's
    * `FilePartition.getFilePartitions`: close the current split when
    * the next blob would exceed maxSplit; each blob contributes its
    * length plus openCost (so many tiny blobs don't collapse into one
    * task, and large ones coalesce toward maxSplit). */
  def packBlobs(blobs: Seq[BlobInfo], maxSplit: Long, openCost: Long): Seq[Seq[BlobInfo]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Seq[BlobInfo]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[BlobInfo]
    var size = 0L
    blobs.foreach { b =>
      if (cur.nonEmpty && size + b.dataLen > maxSplit) {
        parts += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer.empty[BlobInfo]
        size = 0L
      }
      cur += b
      size += b.dataLen + openCost
    }
    if (cur.nonEmpty) parts += cur.toSeq
    parts.toSeq
  }
}

case class OsmPbfPartition(blobs: Array[BlobInfo]) extends InputPartition

/** Driver-side cache of per-blob element stats, built once per
  * file by a parallel Spark job (inflate + field-tag walk only — no
  * element decode). One walk yields per-type id RANGES
  * (`[nMin,nMax,wMin,wMax,rMin,rMax]` per blob); type presence derives
  * from non-empty intervals. Subsequent scans with type or id-range
  * filters prune partitions for free. */
object OsmPbfStats {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Array[Long]]]()

  def ranges(path: String, blobs: Seq[BlobInfo]): Seq[Array[Long]] =
    cache.computeIfAbsent(path, _ => {
      val spark = org.apache.spark.sql.SparkSession.active
      spark.sparkContext
        .parallelize(blobs, math.min(blobs.size, 64).max(1))
        .map { b =>
          val block = OsmPbfFile.readBlob(b, OsmPbfFile.sharedConf)
          OsmPbfFile.blobIdRanges(block)
        }
        .collect().toSeq
    })
}

class OsmPbfReaderFactory(schema: StructType, wantTypes: Array[Boolean],
    idFilterArr: Array[Long], mustTagKeys: Array[String] = null,
    columnar: Boolean = false)
    extends PartitionReaderFactory {

  // Constant across partitions, so Spark's all-or-nothing columnar
  // requirement (Scan.ColumnarSupportMode.PARTITION_DEFINED) holds.
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmPbfPartition]
    new OsmPbfPartitionReader(p, schema.fieldNames, wantTypes,
      if (idFilterArr == null) null else idFilterArr.toSet, mustTagKeys)
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[OsmPbfPartition]
    new OsmPbfColumnarReader(p, schema, wantTypes,
      if (idFilterArr == null) null else idFilterArr.toSet, mustTagKeys)
  }
}

/** Vectorized read path: one `ColumnarBatch` per PrimitiveBlock, columns
  * bulk-filled from the decoder's [[graft.pbf.ScalarBatch]] primitive
  * arrays (scalar columns only — see [[OsmPbfSource.scalarCols]] for
  * why array columns stay on the row path). Eliminates the two
  * per-element costs of the row path — `Decoded` allocation and
  * `InternalRow` construction — on the scalar scans that dominate OSM
  * work (the 7M-row node coordinate table, type counts), and
  * downstream operators read the vectors through Spark's codegen'd
  * ColumnarToRow. The reference's equivalent is its vectorized
  * dense-node parser (reference dense.py:83-180). */
class OsmPbfColumnarReader(p: OsmPbfPartition, schema: StructType,
    wantTypes: Array[Boolean], idFilter: Set[Long],
    mustTagKeys: Array[String])
    extends PartitionReader[ColumnarBatch] {

  // needs.tags covers the must-key CHECK only (string-id test, no
  // materialization) — the tags column itself is row-path-only
  private val needs = DecodeNeeds(
    tags = mustTagKeys != null,
    refs = false, members = false,
    info = schema.fieldNames.exists(f => f == "version" || f == "timestamp" || f == "changeset"),
    coords = schema.fieldNames.exists(f => f == "lat" || f == "lon"))

  private val blobReader = new graft.pbf.BlobReader(graft.pbf.OsmPbfFile.sharedConf)
  private val blobIter = p.blobs.iterator
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    while (blobIter.hasNext) {
      val block = blobReader.read(blobIter.next())
      val sb = BlockDecoder.decodeScalars(block, wantTypes, needs, mustTagKeys, idFilter)
      if (sb.n > 0) {
        batch = toBatch(sb)
        return true
      }
    }
    false
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    blobReader.close()
  }

  private def toBatch(sb: ScalarBatch): ColumnarBatch = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val n = sb.n
    var nodesOnly = true
    var i = 0
    while (i < n && nodesOnly) { nodesOnly = sb.types(i) == OsmPbfSource.TypeNode; i += 1 }
    val vecs = OnHeapColumnVector.allocateColumns(n, schema)
    var c = 0
    while (c < vecs.length) {
      val v = vecs(c)
      schema.fields(c).name match {
        case "id" => v.putLongs(0, n, sb.ids, 0)
        case "type" => v.putBytes(0, n, sb.types, 0)
        case "lat" =>
          if (nodesOnly) v.putDoubles(0, n, sb.lats, 0)
          else {
            var r = 0
            while (r < n) {
              if (sb.types(r) == OsmPbfSource.TypeNode) v.putDouble(r, sb.lats(r))
              else v.putNull(r)
              r += 1
            }
          }
        case "lon" =>
          if (nodesOnly) v.putDoubles(0, n, sb.lons, 0)
          else {
            var r = 0
            while (r < n) {
              if (sb.types(r) == OsmPbfSource.TypeNode) v.putDouble(r, sb.lons(r))
              else v.putNull(r)
              r += 1
            }
          }
        case "version" =>
          var r = 0
          while (r < n) {
            if (sb.hasInfo(r)) v.putInt(r, sb.versions(r)) else v.putNull(r)
            r += 1
          }
        case "timestamp" =>
          var r = 0
          while (r < n) {
            if (sb.hasInfo(r)) v.putLong(r, sb.tsMicros(r)) else v.putNull(r)
            r += 1
          }
        case "changeset" =>
          var r = 0
          while (r < n) {
            if (sb.hasInfo(r)) v.putLong(r, sb.changesets(r)) else v.putNull(r)
            r += 1
          }
        case other => throw new IllegalArgumentException(s"unknown columnar column $other")
      }
      c += 1
    }
    new ColumnarBatch(vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], n)
  }
}

class OsmPbfPartitionReader(p: OsmPbfPartition, fieldNames: Array[String],
    wantTypes: Array[Boolean], idFilter: Set[Long],
    mustTagKeys: Array[String] = null)
    extends PartitionReader[InternalRow] {

  private val needs = DecodeNeeds(
    // the must-tag check reads key ids, so tags must decode even when
    // the tags column itself is pruned (e.g. .select("id") or count())
    tags = fieldNames.contains("tags") || mustTagKeys != null,
    refs = fieldNames.contains("refs"),
    members = fieldNames.contains("members"),
    info = fieldNames.exists(f => f == "version" || f == "timestamp" || f == "changeset"),
    coords = fieldNames.exists(f => f == "lat" || f == "lon"))

  private val blobReader = new graft.pbf.BlobReader(graft.pbf.OsmPbfFile.sharedConf)
  private val iter: Iterator[Decoded] =
    p.blobs.iterator.flatMap { b =>
      val block = blobReader.read(b)
      val base = BlockDecoder.decode(block, wantTypes, needs, mustTagKeys)
      if (idFilter == null) base else base.filter(d => idFilter.contains(d.id))
    }

  private var current: Decoded = _

  override def next(): Boolean = {
    if (iter.hasNext) { current = iter.next(); true } else false
  }

  // column → small int code once per reader, not a string match per row
  private val colCodes: Array[Int] = fieldNames.map {
    case "id" => 0
    case "type" => 1
    case "lat" => 2
    case "lon" => 3
    case "tags" => 4
    case "refs" => 5
    case "members" => 6
    case "version" => 7
    case "timestamp" => 8
    case "changeset" => 9
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def get(): InternalRow = {
    val d = current
    val row = new Array[Any](colCodes.length)
    var i = 0
    while (i < colCodes.length) {
      row(i) = colCodes(i) match {
        case 0 => d.id
        case 1 => d.etype
        case 2 => if (d.etype == 0) d.lat else null
        case 3 => if (d.etype == 0) d.lon else null
        case 4 =>
          new ArrayBasedMapData(
            new GenericArrayData(d.tagKeys.map(k => UTF8String.fromString(k): Any)),
            new GenericArrayData(d.tagVals.map(v => UTF8String.fromString(v): Any)))
        case 5 => new GenericArrayData(d.refs)
        case 6 =>
          new GenericArrayData(d.memberRefs.indices.map { j =>
            InternalRow(UTF8String.fromString(d.memberRoles(j)),
              d.memberRefs(j), d.memberTypes(j))
          }.toArray[Any])
        case 7 => if (d.hasInfo) d.version else null
        case 8 => if (d.hasInfo) d.timestampMs * 1000L else null // micros
        case 9 => if (d.hasInfo) d.changeset else null
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }

  override def close(): Unit = blobReader.close()
}
