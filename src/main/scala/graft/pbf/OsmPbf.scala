package graft.pbf

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.collection.mutable.ArrayBuffer

/** One OSMData blob = one Spark input partition (the unit of parallel
  * decode — the parallelism the single-threaded reference lacks;
  * reference osmdata.py:213-227 processes these sequentially). */
final case class BlobInfo(path: String, dataOffset: Long, dataLen: Int)

/** A decoded OSM element in columnar-friendly primitive form. */
final case class Decoded(
    id: Long,
    etype: Byte, // 0 node, 1 way, 2 relation (reference block.py:29-33)
    lat: Double,
    lon: Double,
    hasCoord: Boolean,
    tagKeys: Array[String],
    tagVals: Array[String],
    refs: Array[Long],
    memberRoles: Array[String],
    memberRefs: Array[Long],
    memberTypes: Array[Byte],
    version: Int,
    timestampMs: Long,
    changeset: Long,
    hasInfo: Boolean)

/** Which element fields a scan needs — projection pushdown into the
  * protobuf decode (reference lazily decodes tags/refs/info the same
  * way: osmquery.py:325-333, primitives.py:23,61,73,31). */
final case class DecodeNeeds(
    tags: Boolean, refs: Boolean, members: Boolean,
    info: Boolean, coords: Boolean)

object DecodeNeeds {
  val all: DecodeNeeds = DecodeNeeds(tags = true, refs = true,
    members = true, info = true, coords = true)
}

/** File framing + HeaderBlock validation
  * (reference headers.py:9-121, osmdata.py:95-125). */
object OsmPbfFile {

  /** Shared read-only Hadoop configuration: `new Configuration()`
    * parses the default XML resources per INSTANCE, and the old code
    * built one per planning call / partition reader / stats-job blob —
    * pure constant overhead multiplied by task count. One lazy
    * instance per JVM serves every read-only `getFileSystem` lookup
    * (the driver's planning walks and the executors' blob readers
    * never mutate it). */
  lazy val sharedConf: Configuration = new Configuration()

  /** Expand a path / directory / glob into concrete `.osm.pbf` files —
    * a 100 TB corpus is a directory of extracts, not one file.
    * Directories matched by a glob contribute their `.pbf` files (one
    * level; no silent drop); an empty directory is a clean error. */
  def expand(pathStr: String, conf: Configuration = sharedConf): Seq[String] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    def pbfFilesUnder(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.toString)
        .filter(_.endsWith(".pbf"))
    val files =
      if (fs.isDirectory(path)) pbfFilesUnder(path)
      else {
        val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) Seq(pathStr) // plain single file (any extension)
        else if (matched.size == 1 && matched.head.isFile)
          Seq(matched.head.getPath.toString) // exact single-file match
        else matched.flatMap { st =>
          if (st.isFile) Seq(st.getPath.toString).filter(_.endsWith(".pbf"))
          else pbfFilesUnder(st.getPath)
        }
      }
    require(files.nonEmpty, s"no .pbf files under $pathStr")
    files.sorted
  }

  /** Index every file under the path/glob (one framing pass each). */
  def indexAll(pathStr: String, conf: Configuration = sharedConf): Seq[BlobInfo] =
    expand(pathStr, conf).flatMap(f => index(f, conf))

  /** Per-JVM blob-index cache keyed by (path, length, mtime): one
    * query plans the SAME scan several times (estimateStatistics,
    * partition planning, and 2-3 scan branches per OSM query), and
    * each planning walk re-read every frame header — ~500 positioned
    * reads per 250-blob extract, multiplied into ~1 s of pure driver
    * planning per osm_big_* row (and at 100 TB, ~3 MB of header reads
    * per 100 GB file per plan). The (len, mtime) key drops stale
    * entries when a file is rewritten — the same freshness contract as
    * Spark's own file-index cache (guide §6). */
  private val indexCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Seq[BlobInfo]]()

  /** Scan `[len:int32-BE][BlobHeader][Blob]` frames; validate the
    * OSMHeader; return one BlobInfo per OSMData blob. Only reads the
    * small header messages + the header blob — ~50 bytes per data blob,
    * so driver-side planning over a 100 TB corpus stays cheap; repeat
    * plans of an unchanged file are served from [[indexCache]]. */
  def index(pathStr: String, conf: Configuration = sharedConf): Seq[BlobInfo] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val st = fs.getFileStatus(path)
    indexCache.computeIfAbsent(
      (pathStr, st.getLen, st.getModificationTime),
      _ => indexUncached(pathStr, conf, st.getLen))
  }

  private def indexUncached(pathStr: String, conf: Configuration,
      fileLen: Long): Seq[BlobInfo] = {
    val path = new Path(pathStr)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val blobs = ArrayBuffer.empty[BlobInfo]
      var off = 0L
      var sawHeader = false
      val lenBuf = new Array[Byte](4)
      while (off < fileLen) {
        in.readFully(off, lenBuf, 0, 4)
        val headerLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
          ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
        val headerBytes = new Array[Byte](headerLen)
        in.readFully(off + 4, headerBytes, 0, headerLen)
        // BlobHeader: type=1 string, indexdata=2, datasize=3 int32
        var blobType = ""
        var dataSize = 0
        val r = new PbfReader(headerBytes)
        while (r.hasMore) {
          val tag = r.readTag()
          (tag >> 3) match {
            case 1 => blobType = r.readString()
            case 3 => dataSize = r.readVarint().toInt
            case _ => r.skip(tag & 7)
          }
        }
        val dataOff = off + 4 + headerLen
        blobType match {
          case "OSMHeader" =>
            val hb = new Array[Byte](dataSize)
            in.readFully(dataOff, hb, 0, dataSize)
            validateHeader(decodeBlob(hb))
            sawHeader = true
          case "OSMData" =>
            blobs += BlobInfo(pathStr, dataOff, dataSize)
          case other =>
            throw new IllegalArgumentException(s"unknown blob type '$other'")
        }
        off = dataOff + dataSize
      }
      require(sawHeader, s"$pathStr: no OSMHeader blob")
      blobs.toSeq
    } finally in.close()
  }

  /** Blob payload extraction: raw(1) / raw_size(2) / zlib_data(3) /
    * lz4_data(6) / zstd_data(7). The reference detects but only
    * implements zlib (headers.py:33-78, block.py:20-23, quirk Q5); we
    * additionally support lz4 + zstd via the JVM codecs Spark already
    * ships (lz4-java, zstd-jni). lzma(4) / obsolete bzip2(5) rejected. */
  def decodeBlob(blob: Array[Byte]): Array[Byte] = {
    val r = new PbfReader(blob)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    var lz4: Array[Byte] = null
    var zstd: Array[Byte] = null
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => raw = r.readBytes()
        case 2 => rawSize = r.readVarint().toInt
        case 3 => zlib = r.readBytes()
        case 6 => lz4 = r.readBytes()
        case 7 => zstd = r.readBytes()
        case f if f == 4 || f == 5 =>
          throw new UnsupportedOperationException(
            s"unsupported blob compression (field $f); only raw/zlib/lz4/zstd")
        case _ => r.skip(tag & 7)
      }
    }
    if (raw != null) raw
    else if (rawSize < 0)
      throw new IllegalArgumentException(
        "compressed blob is missing its raw_size field")
    else if (zlib != null) Zlib.inflate(zlib, rawSize)
    else if (zstd != null) com.github.luben.zstd.Zstd.decompress(zstd, rawSize)
    else if (lz4 != null)
      net.jpountz.lz4.LZ4Factory.fastestInstance()
        .fastDecompressor().decompress(lz4, rawSize)
    else throw new IllegalArgumentException("empty blob")
  }

  /** Required-features check: OsmSchema-V0.6 + DenseNodes only
    * (reference headers.py:81-121). */
  def validateHeader(headerBlock: Array[Byte]): Unit = {
    val supported = Set("OsmSchema-V0.6", "DenseNodes")
    val r = new PbfReader(headerBlock)
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 4 =>
          val feat = r.readString()
          if (!supported.contains(feat))
            throw new UnsupportedOperationException(s"required feature '$feat' not supported")
        case _ => r.skip(tag & 7)
      }
    }
  }

  /** Per-type element counts of one blob WITHOUT decoding elements:
    * walk only the field tags, counting one per plain Node/Way/Relation
    * message and the packed-id varint count per DenseNodes group. This
    * backs the COUNT(*) aggregate pushdown — `info()`-style per-type
    * counts cost inflate + a byte scan instead of a full element decode
    * (the reference's cache stores these counts after its one full
    * parse; osmdata.py:75-79). */
  /** Unlike the skip-driven walks (where `skip(tag & 7)` consumes by
    * whatever wire type arrived), the counting path ASSUMES
    * length-delimited encoding — `countPackedVarints` on a non-packed
    * field would misread a varint as a byte length and walk out of
    * bounds or return garbage counts. Legal-but-unconventional inputs
    * (e.g. an unpacked repeated id field, wire type 0 per element) must
    * therefore fail loudly here, not silently disagree with the full
    * decoder (which shares the packed assumption). */
  @inline private def requireWire(tag: Int, field: String): Unit =
    if ((tag & 7) != 2)
      throw new java.io.IOException(
        s"malformed PrimitiveBlock: $field must be length-delimited (wire type 2), " +
          s"got wire type ${tag & 7} — unpacked/non-message encoding is not supported " +
          "by the stats-walk paths (COUNT pushdown, id-range index)")

  def countTypes(block: Array[Byte]): (Long, Long, Long) = {
    var n = 0L
    var w = 0L
    var rel = 0L
    val root = new PbfReader(block)
    while (root.hasMore) {
      val tag = root.readTag()
      if ((tag >> 3) == 2) {
        requireWire(tag, "primitivegroup")
        val g = root.readMessage()
        while (g.hasMore) {
          val t2 = g.readTag()
          (t2 >> 3) match {
            case 1 => requireWire(t2, "Node"); n += 1; g.skip(2)
            case 2 =>
              requireWire(t2, "DenseNodes")
              val d = g.readMessage()
              while (d.hasMore) {
                val t3 = d.readTag()
                if ((t3 >> 3) == 1) { requireWire(t3, "DenseNodes.id"); n += d.countPackedVarints() }
                else d.skip(t3 & 7)
              }
            case 3 => requireWire(t2, "Way"); w += 1; g.skip(2)
            case 4 => requireWire(t2, "Relation"); rel += 1; g.skip(2)
            case _ => g.skip(t2 & 7)
          }
        }
      } else root.skip(tag & 7)
    }
    (n, w, rel)
  }

  /** Per-type id ranges of one blob WITHOUT decoding elements — the
    * same inflate + field-tag walk tier as [[countTypes]] (F10 — the
    * reference's per-block type index, osmquery.py:242-247; type
    * presence derives from non-empty intervals), additionally reading
    * ONLY each element's id field
    * (plain Node id is zigzag, Way/Relation ids plain varints,
    * DenseNodes ids packed zigzag deltas — mirroring the decoder).
    * Returns `[nMin,nMax,wMin,wMax,rMin,rMax]`, with the
    * (Long.MaxValue, Long.MinValue) empty-interval sentinel for an
    * absent type. Backs the multi-file border-overlap analysis
    * (OsmQueryExec border dedup) and blob pruning for id-range
    * filtered scans. */
  def blobIdRanges(block: Array[Byte]): Array[Long] = {
    val out = Array(Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue,
      Long.MaxValue, Long.MinValue)
    @inline def upd(t: Int, id: Long): Unit = {
      if (id < out(2 * t)) out(2 * t) = id
      if (id > out(2 * t + 1)) out(2 * t + 1) = id
    }
    def elemId(g: PbfReader, zig: Boolean): Long = {
      var id = 0L
      while (g.hasMore) {
        val t = g.readTag()
        if ((t >> 3) == 1 && (t & 7) == 0) {
          id = if (zig) g.readZigzag() else g.readVarint()
        } else g.skip(t & 7)
      }
      id
    }
    val root = new PbfReader(block)
    while (root.hasMore) {
      val tag = root.readTag()
      if ((tag >> 3) == 2) {
        // same loud-failure rule as countTypes (review r22): a
        // non-length-delimited group/element would be misparsed into
        // GARBAGE ranges, and wrong ranges silently drop blobs via
        // pruning / misclassify border keys — reject like the decoder
        requireWire(tag, "primitivegroup")
        val g = root.readMessage()
        while (g.hasMore) {
          val t2 = g.readTag()
          (t2 >> 3) match {
            case 1 =>
              requireWire(t2, "Node")
              upd(0, elemId(g.readMessage(), zig = true))
            case 2 =>
              requireWire(t2, "DenseNodes")
              val d = g.readMessage()
              while (d.hasMore) {
                val t3 = d.readTag()
                if ((t3 >> 3) == 1) {
                  requireWire(t3, "DenseNodes.id")
                  val ids = d.readPackedLongs(zigzag = true, delta = true)
                  var i = 0
                  while (i < ids.length) { upd(0, ids(i)); i += 1 }
                } else d.skip(t3 & 7)
              }
            case 3 =>
              requireWire(t2, "Way")
              upd(1, elemId(g.readMessage(), zig = false))
            case 4 =>
              requireWire(t2, "Relation")
              upd(2, elemId(g.readMessage(), zig = false))
            case _ => g.skip(t2 & 7)
          }
        }
      } else root.skip(tag & 7)
    }
    out
  }

  def readBlob(info: BlobInfo, conf: Configuration): Array[Byte] = {
    val path = new Path(info.path)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](info.dataLen)
      in.readFully(info.dataOffset, buf, 0, info.dataLen)
      decodeBlob(buf)
    } finally in.close()
  }
}

/** Per-partition blob reader: one open stream per FILE for the
  * partition's lifetime, with positioned reads per blob —
  * [[OsmPbfFile.readBlob]] opens and closes per BLOB, which is noise
  * on a local filesystem but a metadata round-trip (HEAD + GET) per
  * 8k-element block on the object stores a 100 TB corpus lives on.
  * A partition's blobs are consecutive within a file (split packing
  * preserves index order), so the map holds at most a handful of
  * streams. Not thread-safe; each Spark task owns its reader. */
final class BlobReader(conf: Configuration) extends AutoCloseable {
  private val streams =
    scala.collection.mutable.HashMap.empty[String, org.apache.hadoop.fs.FSDataInputStream]

  def read(info: BlobInfo): Array[Byte] = {
    val in = streams.getOrElseUpdate(info.path, {
      val p = new Path(info.path)
      p.getFileSystem(conf).open(p)
    })
    val buf = new Array[Byte](info.dataLen)
    in.readFully(info.dataOffset, buf, 0, info.dataLen)
    OsmPbfFile.decodeBlob(buf)
  }

  override def close(): Unit = {
    streams.values.foreach(s => try s.close() catch { case _: java.io.IOException => })
    streams.clear()
  }
}

/** PrimitiveBlock → elements decoder (reference block.py:8-130,
  * primitives.py:9-147, dense.py:8-80 — but emitting real strings and
  * maps immediately; the reference's global string dictionary is
  * deliberately dropped, SURVEY §4.3). */
object BlockDecoder {

  private val emptyS = Array.empty[String]
  private val emptyL = Array.empty[Long]
  private val emptyB = Array.empty[Byte]

  /** @param wantTypes which of node(0)/way(1)/relation(2) to emit —
    *   type pushdown skips decoding whole primitive groups
    *   (reference osmquery.py:242-247).
    * @param mustTagKeys when non-null, emit only elements whose tag-key
    *   set intersects these keys (F3 ∃ semantics). The check runs on
    *   block-local string IDS before any string materialization — the
    *   reference's abort-parse-on-tag-mismatch pushdown
    *   (primitives.py:23-27) plus its unsatisfiable-filter block skip
    *   (osmquery.py:311-323) when no key occurs in the string table. */
  def decode(block: Array[Byte], wantTypes: Array[Boolean],
             needs: DecodeNeeds, mustTagKeys: Array[String] = null): Iterator[Decoded] = {
    val root = new PbfReader(block)
    var strings: Array[String] = null
    val groupSpans = ArrayBuffer.empty[(Int, Int)]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L

    while (root.hasMore) {
      val tag = root.readTag()
      (tag >> 3) match {
        case 1 => // stringtable
          val st = root.readMessage()
          val buf = ArrayBuffer.empty[String]
          while (st.hasMore) {
            val t2 = st.readTag()
            if ((t2 >> 3) == 1) buf += st.readString() else st.skip(t2 & 7)
          }
          strings = buf.toArray
        case 2 =>
          val m = root.readMessage()
          groupSpans += ((m.pos, m.end))
        case 17 => granularity = root.readVarint()
        case 18 => dateGranularity = root.readVarint()
        case 19 => latOffset = root.readVarint()
        case 20 => lonOffset = root.readVarint()
        case _ => root.skip(tag & 7)
      }
    }
    val strs = if (strings == null) emptyS else strings
    // must-tag keys → block-local string-id membership (the reference's
    // strmap, osmquery.py:249-251); an empty map means no element in
    // this block can match — skip the whole block
    var isMust: Array[Boolean] = null
    if (mustTagKeys != null) {
      val keySet = mustTagKeys.toSet
      isMust = new Array[Boolean](strs.length)
      var any = false
      var i = 0
      while (i < strs.length) {
        if (keySet.contains(strs(i))) { isMust(i) = true; any = true }
        i += 1
      }
      if (!any) return Iterator.empty
    }
    val out = ArrayBuffer.empty[Decoded]
    groupSpans.foreach { case (s, e) =>
      decodeGroup(new PbfReader(root.buf, s, e), strs, wantTypes, needs, isMust,
        granularity, latOffset, lonOffset, dateGranularity, out)
    }
    out.iterator
  }

  /** Columnar block decode for the vectorized scan path: same semantics
    * as [[decode]] restricted to the scalar columns
    * (`id, type, lat, lon, version, timestamp, changeset`), with the
    * DenseNodes fast path converting whole packed arrays into the
    * [[ScalarBatch]] columns with no per-element allocation — the JVM
    * analogue of the reference's vectorized dense parser (reference
    * dense.py:83-180). Tags/refs/members are row-path-only (a CSR
    * refs/tags batch tier existed in round 7, retired in round 8 on
    * warm-JVM parity — README "Columnar refs/tags tier"); tag keys are
    * still READ here when a must-key check is pushed, as block-local
    * string ids with no materialization.
    *
    * @param idFilter when non-null, only elements with these ids are
    *   emitted (the same post-decode filter the row reader applies). */
  def decodeScalars(block: Array[Byte], wantTypes: Array[Boolean],
      needs: DecodeNeeds, mustTagKeys: Array[String],
      idFilter: Set[Long]): ScalarBatch = {
    val root = new PbfReader(block)
    var strings: Array[String] = null
    val groupSpans = ArrayBuffer.empty[(Int, Int)]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L
    while (root.hasMore) {
      val tag = root.readTag()
      (tag >> 3) match {
        case 1 =>
          val st = root.readMessage()
          val buf = ArrayBuffer.empty[String]
          while (st.hasMore) {
            val t2 = st.readTag()
            if ((t2 >> 3) == 1) buf += st.readString() else st.skip(t2 & 7)
          }
          strings = buf.toArray
        case 2 =>
          val m = root.readMessage()
          groupSpans += ((m.pos, m.end))
        case 17 => granularity = root.readVarint()
        case 18 => dateGranularity = root.readVarint()
        case 19 => latOffset = root.readVarint()
        case 20 => lonOffset = root.readVarint()
        case _ => root.skip(tag & 7)
      }
    }
    val strs = if (strings == null) emptyS else strings
    val out = new ScalarBatch()
    var isMust: Array[Boolean] = null
    if (mustTagKeys != null) {
      val keySet = mustTagKeys.toSet
      isMust = new Array[Boolean](strs.length)
      var any = false
      var i = 0
      while (i < strs.length) {
        if (keySet.contains(strs(i))) { isMust(i) = true; any = true }
        i += 1
      }
      if (!any) return out
    }
    groupSpans.foreach { case (s, e) =>
      val g = new PbfReader(root.buf, s, e)
      while (g.hasMore) {
        val tag = g.readTag()
        (tag >> 3) match {
          case 1 => // Node (plain) — direct scalar decode, no row spill
            if (wantTypes(0)) decodeNodeScalar(g.readMessage(), isMust, needs,
              granularity, latOffset, lonOffset, dateGranularity, idFilter, out)
            else g.skip(2)
          case 2 => // DenseNodes — the vectorized fast path
            if (wantTypes(0)) decodeDenseScalars(g.readMessage(), needs, isMust,
              idFilter, granularity, latOffset, lonOffset, dateGranularity, out)
            else g.skip(2)
          case 3 => // Way — direct scalar decode
            if (wantTypes(1)) decodeWayRelScalar(g.readMessage(), etype = 1,
              isMust, needs, dateGranularity, idFilter, out)
            else g.skip(2)
          case 4 => // Relation — direct scalar decode
            if (wantTypes(2)) decodeWayRelScalar(g.readMessage(), etype = 2,
              isMust, needs, dateGranularity, idFilter, out)
            else g.skip(2)
          case _ => g.skip(tag & 7)
        }
      }
    }
    out
  }

  /** Plain-Node scalar decode straight into the batch: tag keys are read
    * only when a must-key test is active (the scalar columns never need
    * string materialization), and the element skips the batch entirely
    * when the must/id filters reject it — the round-4/5 `Decoded`
    * allocation round-trip is gone. */
  private def decodeNodeScalar(r: PbfReader, isMust: Array[Boolean],
      needs: DecodeNeeds, gran: Long, latOff: Long, lonOff: Long,
      dateGran: Long, idFilter: Set[Long],
      out: ScalarBatch): Unit = {
    var id = 0L
    var lat = 0L
    var lon = 0L
    var keys = emptyL
    var version = -1
    var ts = 0L
    var cs = 0L
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => id = r.readZigzag()
        case 2 => if (isMust != null) keys = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 4 =>
          if (needs.info) {
            val (v, t, c) = decodeInfo(r.readMessage(), dateGran)
            version = v; ts = t; cs = c; hasInfo = true
          } else r.skip(2)
        case 8 => lat = r.readZigzag()
        case 9 => lon = r.readZigzag()
        case _ => r.skip(tag & 7)
      }
    }
    if (!keysMatch(keys, isMust)) return
    if (idFilter == null || idFilter.contains(id)) {
      out.add(id, 0, 1e-9 * (latOff + gran * lat), 1e-9 * (lonOff + gran * lon),
        version, ts * 1000L, cs, hasInfo)
    }
  }

  /** Way/Relation scalar decode straight into the batch (the two share
    * a wire layout for every scalar-relevant field: id(1), keys(2),
    * info(4)). Tags/refs/members stay row-path-only — the tag keys are
    * read here only for the must-key CHECK (string-id test, nothing
    * materializes). */
  private def decodeWayRelScalar(r: PbfReader, etype: Byte,
      isMust: Array[Boolean], needs: DecodeNeeds, dateGran: Long,
      idFilter: Set[Long], out: ScalarBatch): Unit = {
    var id = 0L
    var keys = emptyL
    var version = -1
    var ts = 0L
    var cs = 0L
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => if (isMust != null) keys = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 4 =>
          if (needs.info) {
            val (v, t, c) = decodeInfo(r.readMessage(), dateGran)
            version = v; ts = t; cs = c; hasInfo = true
          } else r.skip(2)
        case _ => r.skip(tag & 7)
      }
    }
    if (!keysMatch(keys, isMust)) return
    if (idFilter == null || idFilter.contains(id)) {
      out.add(id, etype, 0.0, 0.0, version, ts * 1000L, cs, hasInfo)
    }
  }

  /** DenseNodes → ScalarBatch. With no must-tag / id filter the packed
    * arrays convert to columns in four tight loops (ids copy, two
    * coordinate de-quantizations, info widening); with filters it falls
    * back to the same per-node walk as [[decodeDense]] minus string
    * materialization. */
  private def decodeDenseScalars(r: PbfReader, needs: DecodeNeeds,
      isMust: Array[Boolean], idFilter: Set[Long],
      gran: Long, latOff: Long, lonOff: Long, dateGran: Long,
      out: ScalarBatch): Unit = {
    var ids = emptyL
    var lats = emptyL
    var lons = emptyL
    var kvs: Array[Long] = emptyL
    var versions: Array[Long] = emptyL
    var tss: Array[Long] = emptyL
    var css: Array[Long] = emptyL
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => ids = r.readPackedLongs(zigzag = true, delta = true)
        case 5 =>
          if (needs.info) {
            val di = r.readMessage()
            hasInfo = true
            while (di.hasMore) {
              val t2 = di.readTag()
              (t2 >> 3) match {
                case 1 => versions = di.readPackedLongs(zigzag = false, delta = false)
                case 2 => tss = di.readPackedLongs(zigzag = true, delta = true)
                case 3 => css = di.readPackedLongs(zigzag = true, delta = true)
                case _ => di.skip(t2 & 7)
              }
            }
          } else r.skip(2)
        case 8 => if (needs.coords) lats = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case 9 => if (needs.coords) lons = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case 10 => if (isMust != null) kvs = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case _ => r.skip(tag & 7)
      }
    }
    val m = ids.length
    val tsScale = dateGran * 1000L // DenseInfo timestamp units → epoch micros
    if (isMust == null && idFilter == null) {
      out.ensure(m)
      val base = out.n
      System.arraycopy(ids, 0, out.ids, base, m)
      // types stay 0 (node): fresh ScalarBatch slots are zero-filled
      if (lats.nonEmpty) {
        var i = 0
        while (i < m) { out.lats(base + i) = 1e-9 * (latOff + gran * lats(i)); i += 1 }
      }
      if (lons.nonEmpty) {
        var i = 0
        while (i < m) { out.lons(base + i) = 1e-9 * (lonOff + gran * lons(i)); i += 1 }
      }
      if (versions.nonEmpty) {
        var i = 0
        while (i < m) { out.versions(base + i) = versions(i).toInt; i += 1 }
      } else if (hasInfo) java.util.Arrays.fill(out.versions, base, base + m, -1)
      if (tss.nonEmpty) {
        var i = 0
        while (i < m) { out.tsMicros(base + i) = tss(i) * tsScale; i += 1 }
      }
      if (css.nonEmpty) System.arraycopy(css, 0, out.changesets, base, m)
      if (hasInfo) java.util.Arrays.fill(out.hasInfo, base, base + m, true)
      out.n = base + m
    } else {
      var kvPos = 0
      var i = 0
      while (i < m) {
        // bound the node's kv span first (the must check reads it; the
        // delimiter is consumed exactly once per node)
        var spanStart = 0
        var spanEnd = 0
        if (kvs.nonEmpty && kvPos < kvs.length) {
          spanStart = kvPos
          var p = kvPos
          while (p < kvs.length && kvs(p) != 0L) p += 2
          if (p > kvs.length) badKvSpan("DenseNodes keys_vals key without value")
          spanEnd = p
          kvPos = if (p < kvs.length) p + 1 else p
        }
        var matched = isMust == null
        if (isMust != null) {
          var q = spanStart
          while (!matched && q < spanEnd) {
            if (isMust(mustIx(kvs(q), isMust.length))) matched = true
            q += 2
          }
        }
        if (matched && (idFilter == null || idFilter.contains(ids(i)))) {
          out.add(ids(i), 0,
            if (lats.isEmpty) 0.0 else 1e-9 * (latOff + gran * lats(i)),
            if (lons.isEmpty) 0.0 else 1e-9 * (lonOff + gran * lons(i)),
            if (versions.nonEmpty) versions(i).toInt else -1,
            if (tss.nonEmpty) tss(i) * tsScale else 0L,
            if (css.nonEmpty) css(i) else 0L,
            hasInfo)
        }
        i += 1
      }
    }
  }

  /** any key id flagged in isMust? (integer check, pre-materialization) */
  private def keysMatch(keys: Array[Long], isMust: Array[Boolean]): Boolean = {
    if (isMust == null) return true
    var i = 0
    while (i < keys.length) {
      if (isMust(mustIx(keys(i), isMust.length))) return true
      i += 1
    }
    false
  }

  /** Fail-loudly guard for tag key/val wire arrays: a truncated or
    * odd-length span in a corrupt block must raise the same
    * 'malformed PrimitiveBlock' IOException as [[requireWire]] /
    * [[mustIx]], never a raw ArrayIndexOutOfBoundsException. */
  private def badKvSpan(what: String): Nothing =
    throw new java.io.IOException(
      s"malformed PrimitiveBlock: truncated tag key/val span ($what)")

  /** bounds-checked string-table id for the must-key test: a corrupt
    * block with a key id outside the string table raises the same
    * 'malformed pbf' framing error as the Proto.scala overrun guards
    * instead of an ArrayIndexOutOfBoundsException. */
  private def mustIx(id: Long, n: Int): Int = {
    if (id < 0L || id >= n)
      throw new IllegalArgumentException(
        s"malformed pbf: tag key id $id outside string table (size=$n)")
    id.toInt
  }

  private def decodeGroup(g: PbfReader, strings: Array[String],
      wantTypes: Array[Boolean], needs: DecodeNeeds, isMust: Array[Boolean],
      gran: Long, latOff: Long, lonOff: Long, dateGran: Long,
      out: ArrayBuffer[Decoded]): Unit = {
    while (g.hasMore) {
      val tag = g.readTag()
      (tag >> 3) match {
        case 1 => // Node
          if (wantTypes(0)) decodeNode(g.readMessage(), strings, needs, isMust,
            gran, latOff, lonOff, dateGran, out)
          else g.skip(2)
        case 2 => // DenseNodes
          if (wantTypes(0)) decodeDense(g.readMessage(), strings, needs, isMust,
            gran, latOff, lonOff, dateGran, out)
          else g.skip(2)
        case 3 => // Way
          if (wantTypes(1)) decodeWay(g.readMessage(), strings, needs, isMust, dateGran, out)
          else g.skip(2)
        case 4 => // Relation
          if (wantTypes(2)) decodeRelation(g.readMessage(), strings, needs, isMust, dateGran, out)
          else g.skip(2)
        case _ => g.skip(tag & 7)
      }
    }
  }

  /** Info submessage → (version, timestampMs, changeset). */
  private def decodeInfo(r: PbfReader, dateGran: Long): (Int, Long, Long) = {
    var version = -1
    var ts = 0L
    var cs = 0L
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => version = r.readVarint().toInt
        case 2 => ts = r.readVarint() * dateGran
        case 3 => cs = r.readVarint()
        case _ => r.skip(tag & 7)
      }
    }
    (version, ts, cs)
  }

  private def decodeNode(r: PbfReader, strings: Array[String], needs: DecodeNeeds,
      isMust: Array[Boolean],
      gran: Long, latOff: Long, lonOff: Long, dateGran: Long,
      out: ArrayBuffer[Decoded]): Unit = {
    var id = 0L
    var lat = 0L
    var lon = 0L
    var keys = emptyL
    var vals = emptyL
    var version = -1
    var ts = 0L
    var cs = 0L
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => id = r.readZigzag()
        case 2 => if (needs.tags) keys = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 4 =>
          if (needs.info) {
            val (v, t, c) = decodeInfo(r.readMessage(), dateGran)
            version = v; ts = t; cs = c; hasInfo = true
          } else r.skip(2)
        case 3 => if (needs.tags) vals = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 8 => lat = r.readZigzag()
        case 9 => lon = r.readZigzag()
        case _ => r.skip(tag & 7)
      }
    }
    if (!keysMatch(keys, isMust)) return
    val (tk, tv) = lookupTags(keys, vals, strings)
    out += Decoded(id, 0,
      1e-9 * (latOff + gran * lat), 1e-9 * (lonOff + gran * lon), needs.coords,
      tk, tv, emptyL, emptyS, emptyL, emptyB, version, ts, cs, hasInfo)
  }

  /** Vectorized DenseNodes incl. the 0-delimited keys_vals splitter
    * (reference dense.py:8-50, protobuf.pyx:74-106). */
  private def decodeDense(r: PbfReader, strings: Array[String], needs: DecodeNeeds,
      isMust: Array[Boolean],
      gran: Long, latOff: Long, lonOff: Long, dateGran: Long,
      out: ArrayBuffer[Decoded]): Unit = {
    var ids = emptyL
    var lats = emptyL
    var lons = emptyL
    var kvs: Array[Long] = emptyL
    var versions: Array[Long] = emptyL
    var tss: Array[Long] = emptyL
    var css: Array[Long] = emptyL
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => ids = r.readPackedLongs(zigzag = true, delta = true)
        case 5 =>
          if (needs.info) {
            val di = r.readMessage()
            hasInfo = true
            while (di.hasMore) {
              val t2 = di.readTag()
              (t2 >> 3) match {
                case 1 => versions = di.readPackedLongs(zigzag = false, delta = false)
                case 2 => tss = di.readPackedLongs(zigzag = true, delta = true)
                case 3 => css = di.readPackedLongs(zigzag = true, delta = true)
                case _ => di.skip(t2 & 7)
              }
            }
          } else r.skip(2)
        case 8 => if (needs.coords) lats = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case 9 => if (needs.coords) lons = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case 10 => if (needs.tags) kvs = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case _ => r.skip(tag & 7)
      }
    }
    var kvPos = 0
    var i = 0
    while (i < ids.length) {
      var tk = emptyS
      var tv = emptyS
      var matched = isMust == null
      if (kvs.nonEmpty && kvPos < kvs.length) {
        // pass 1 — span + must-key match on raw string ids (no string
        // materialization for filtered-out nodes)
        var p = kvPos
        while (p < kvs.length && kvs(p) != 0L) {
          if (!matched && isMust(mustIx(kvs(p), isMust.length))) matched = true
          p += 2
        }
        if (p > kvs.length) badKvSpan("DenseNodes keys_vals key without value")
        if (matched && p > kvPos) {
          val n = (p - kvPos) / 2
          tk = new Array[String](n)
          tv = new Array[String](n)
          var j = 0
          while (j < n) {
            tk(j) = strings(kvs(kvPos + 2 * j).toInt)
            tv(j) = strings(kvs(kvPos + 2 * j + 1).toInt)
            j += 1
          }
        }
        kvPos = p + 1 // consume the 0 delimiter
      }
      if (matched) {
        out += Decoded(ids(i), 0,
          if (lats.isEmpty) 0.0 else 1e-9 * (latOff + gran * lats(i)),
          if (lons.isEmpty) 0.0 else 1e-9 * (lonOff + gran * lons(i)),
          needs.coords, tk, tv, emptyL, emptyS, emptyL, emptyB,
          if (versions.nonEmpty) versions(i).toInt else -1,
          if (tss.nonEmpty) tss(i) * dateGran else 0L,
          if (css.nonEmpty) css(i) else 0L,
          hasInfo)
      }
      i += 1
    }
  }

  private def decodeWay(r: PbfReader, strings: Array[String], needs: DecodeNeeds,
      isMust: Array[Boolean], dateGran: Long, out: ArrayBuffer[Decoded]): Unit = {
    var id = 0L
    var keys = emptyL
    var vals = emptyL
    var refs = emptyL
    var version = -1
    var ts = 0L
    var cs = 0L
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => if (needs.tags) keys = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 3 => if (needs.tags) vals = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 4 =>
          if (needs.info) {
            val (v, t, c) = decodeInfo(r.readMessage(), dateGran)
            version = v; ts = t; cs = c; hasInfo = true
          } else r.skip(2)
        case 8 => if (needs.refs) refs = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case _ => r.skip(tag & 7)
      }
    }
    if (!keysMatch(keys, isMust)) return
    val (tk, tv) = lookupTags(keys, vals, strings)
    out += Decoded(id, 1, 0.0, 0.0, hasCoord = false,
      tk, tv, refs, emptyS, emptyL, emptyB, version, ts, cs, hasInfo)
  }

  private def decodeRelation(r: PbfReader, strings: Array[String], needs: DecodeNeeds,
      isMust: Array[Boolean], dateGran: Long, out: ArrayBuffer[Decoded]): Unit = {
    var id = 0L
    var keys = emptyL
    var vals = emptyL
    var roleSids = Array.empty[Int]
    var memids = emptyL
    var types = Array.empty[Int]
    var version = -1
    var ts = 0L
    var cs = 0L
    var hasInfo = false
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >> 3) match {
        case 1 => id = r.readVarint()
        case 2 => if (needs.tags) keys = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 3 => if (needs.tags) vals = r.readPackedLongs(zigzag = false, delta = false) else r.skip(2)
        case 4 =>
          if (needs.info) {
            val (v, t, c) = decodeInfo(r.readMessage(), dateGran)
            version = v; ts = t; cs = c; hasInfo = true
          } else r.skip(2)
        case 8 => if (needs.members) roleSids = r.readPackedInts() else r.skip(2)
        case 9 => if (needs.members) memids = r.readPackedLongs(zigzag = true, delta = true) else r.skip(2)
        case 10 => if (needs.members) types = r.readPackedInts() else r.skip(2)
        case _ => r.skip(tag & 7)
      }
    }
    if (!keysMatch(keys, isMust)) return
    val (tk, tv) = lookupTags(keys, vals, strings)
    val roles = if (roleSids.nonEmpty) roleSids.map(strings(_)) else emptyS
    val mtypes = if (types.nonEmpty) types.map(_.toByte) else emptyB
    out += Decoded(id, 2, 0.0, 0.0, hasCoord = false,
      tk, tv, emptyL, roles, memids, mtypes, version, ts, cs, hasInfo)
  }

  private def lookupTags(keys: Array[Long], vals: Array[Long],
      strings: Array[String]): (Array[String], Array[String]) = {
    if (keys.isEmpty) (emptyS, emptyS)
    else {
      if (vals.length < keys.length) badKvSpan("Way/Relation vals shorter than keys")
      val tk = new Array[String](keys.length)
      val tv = new Array[String](keys.length)
      var i = 0
      while (i < keys.length) {
        tk(i) = strings(keys(i).toInt)
        tv(i) = strings(vals(i).toInt)
        i += 1
      }
      (tk, tv)
    }
  }
}
