package graft.pbf

import java.io.{BufferedOutputStream, FileOutputStream}
import scala.collection.mutable

/** Synthetic `.osm.pbf` encoder for golden fixtures (FIXTURES.md §B).
  * Encodes the same subset of the public OSM PBF format the reader
  * supports: zlib OSMData blobs, OsmSchema-V0.6 + DenseNodes,
  * granularity/offset coordinate quantization.
  */
object OsmPbfWriter {

  sealed trait Elem { def id: Long; def tags: Seq[(String, String)]; def info: Option[Info] }
  final case class Info(version: Int, timestampSec: Long, changeset: Long)
  final case class N(id: Long, lat: Double, lon: Double,
      tags: Seq[(String, String)] = Nil, info: Option[Info] = None) extends Elem
  final case class W(id: Long, refs: Seq[Long],
      tags: Seq[(String, String)] = Nil, info: Option[Info] = None) extends Elem
  final case class R(id: Long, members: Seq[(String, Long, Byte)], // (role, ref, type 0/1/2)
      tags: Seq[(String, String)] = Nil, info: Option[Info] = None) extends Elem

  /** One block per element seq; nodes encoded dense when denseNodes=true.
    * codec ∈ raw | zlib | lz4 | zstd (blob fields 1/3/6/7). */
  def write(path: String, blocks: Seq[Seq[Elem]], denseNodes: Boolean = true,
      granularity: Long = 100, latOffset: Long = 0, lonOffset: Long = 0,
      dateGranularity: Long = 1000, codec: String = "zlib"): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      writeFrame(out, "OSMHeader", headerBlock(), codec)
      blocks.foreach { es =>
        writeFrame(out, "OSMData",
          primitiveBlock(es, denseNodes, granularity, latOffset, lonOffset, dateGranularity),
          codec)
      }
    } finally out.close()
  }

  private def headerBlock(): Array[Byte] = {
    val w = new PbfWriter
    w.writeString(4, "OsmSchema-V0.6")
    w.writeString(4, "DenseNodes")
    w.toBytes
  }

  private def writeFrame(out: java.io.OutputStream, blobType: String,
      payload: Array[Byte], codec: String): Unit = {
    val blob = new PbfWriter
    codec match {
      case "raw" =>
        blob.writeBytes(1, payload)
      case "zlib" =>
        blob.writeVarintField(2, payload.length)
        blob.writeBytes(3, Zlib.deflate(payload))
      case "lz4" =>
        blob.writeVarintField(2, payload.length)
        blob.writeBytes(6,
          net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor().compress(payload))
      case "zstd" =>
        blob.writeVarintField(2, payload.length)
        blob.writeBytes(7, com.github.luben.zstd.Zstd.compress(payload))
      case other => throw new IllegalArgumentException(s"unknown codec '$other'")
    }
    val blobBytes = blob.toBytes
    val header = new PbfWriter
    header.writeString(1, blobType)
    header.writeVarintField(3, blobBytes.length)
    val headerBytes = header.toBytes
    out.write(Array[Byte](
      ((headerBytes.length >> 24) & 0xff).toByte,
      ((headerBytes.length >> 16) & 0xff).toByte,
      ((headerBytes.length >> 8) & 0xff).toByte,
      (headerBytes.length & 0xff).toByte))
    out.write(headerBytes)
    out.write(blobBytes)
  }

  private def primitiveBlock(es: Seq[Elem], dense: Boolean, gran: Long,
      latOff: Long, lonOff: Long, dateGran: Long): Array[Byte] = {
    // string table: index 0 reserved as ""
    val strings = mutable.LinkedHashMap[String, Int]("" -> 0)
    def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    es.foreach { e =>
      e.tags.foreach { case (k, v) => sid(k); sid(v) }
      e match {
        case r: R => r.members.foreach { case (role, _, _) => sid(role) }
        case _ =>
      }
    }

    def quantLat(lat: Double): Long = ((lat / 1e-9 - latOff) / gran).round
    def quantLon(lon: Double): Long = ((lon / 1e-9 - lonOff) / gran).round

    def infoMsg(i: Info): PbfWriter = {
      val w = new PbfWriter
      w.writeVarintField(1, i.version)
      w.writeVarintField(2, i.timestampSec * 1000 / dateGran)
      w.writeVarintField(3, i.changeset)
      w
    }

    val group = new PbfWriter
    val nodes = es.collect { case n: N => n }
    val ways = es.collect { case w: W => w }
    val rels = es.collect { case r: R => r }

    if (nodes.nonEmpty && dense) {
      val d = new PbfWriter
      d.writePackedLongs(1, nodes.map(_.id), zigzag = true, delta = true)
      if (nodes.exists(_.info.isDefined)) {
        val di = new PbfWriter
        di.writePackedLongs(1, nodes.map(_.info.map(_.version.toLong).getOrElse(0L)),
          zigzag = false, delta = false)
        di.writePackedLongs(2, nodes.map(_.info.map(_.timestampSec * 1000 / dateGran).getOrElse(0L)),
          zigzag = true, delta = true)
        di.writePackedLongs(3, nodes.map(_.info.map(_.changeset).getOrElse(0L)),
          zigzag = true, delta = true)
        d.writeMessage(5, di)
      }
      d.writePackedLongs(8, nodes.map(n => quantLat(n.lat)), zigzag = true, delta = true)
      d.writePackedLongs(9, nodes.map(n => quantLon(n.lon)), zigzag = true, delta = true)
      val kvs = nodes.flatMap(n =>
        n.tags.flatMap { case (k, v) => Seq(sid(k).toLong, sid(v).toLong) } :+ 0L)
      if (kvs.exists(_ != 0L)) d.writePackedLongs(10, kvs, zigzag = false, delta = false)
      group.writeMessage(2, d)
    } else nodes.foreach { n =>
      val m = new PbfWriter
      m.writeTag(1, 0); m.writeZigzag(n.id)
      if (n.tags.nonEmpty) {
        m.writePackedLongs(2, n.tags.map(t => sid(t._1).toLong), zigzag = false, delta = false)
        m.writePackedLongs(3, n.tags.map(t => sid(t._2).toLong), zigzag = false, delta = false)
      }
      n.info.foreach(i => m.writeMessage(4, infoMsg(i)))
      m.writeTag(8, 0); m.writeZigzag(quantLat(n.lat))
      m.writeTag(9, 0); m.writeZigzag(quantLon(n.lon))
      group.writeMessage(1, m)
    }

    ways.foreach { w0 =>
      val m = new PbfWriter
      m.writeVarintField(1, w0.id)
      if (w0.tags.nonEmpty) {
        m.writePackedLongs(2, w0.tags.map(t => sid(t._1).toLong), zigzag = false, delta = false)
        m.writePackedLongs(3, w0.tags.map(t => sid(t._2).toLong), zigzag = false, delta = false)
      }
      w0.info.foreach(i => m.writeMessage(4, infoMsg(i)))
      m.writePackedLongs(8, w0.refs, zigzag = true, delta = true)
      group.writeMessage(3, m)
    }

    rels.foreach { r0 =>
      val m = new PbfWriter
      m.writeVarintField(1, r0.id)
      if (r0.tags.nonEmpty) {
        m.writePackedLongs(2, r0.tags.map(t => sid(t._1).toLong), zigzag = false, delta = false)
        m.writePackedLongs(3, r0.tags.map(t => sid(t._2).toLong), zigzag = false, delta = false)
      }
      r0.info.foreach(i => m.writeMessage(4, infoMsg(i)))
      m.writePackedLongs(8, r0.members.map(mm => sid(mm._1).toLong), zigzag = false, delta = false)
      m.writePackedLongs(9, r0.members.map(_._2), zigzag = true, delta = true)
      m.writePackedLongs(10, r0.members.map(_._3.toLong), zigzag = false, delta = false)
      group.writeMessage(4, m)
    }

    val block = new PbfWriter
    val st = new PbfWriter
    strings.keys.foreach(s => st.writeString(1, s))
    block.writeMessage(1, st)
    block.writeMessage(2, group)
    block.writeVarintField(17, gran)
    block.writeVarintField(18, dateGran)
    block.writeVarintField(19, latOff)
    block.writeVarintField(20, lonOff)
    block.toBytes
  }
}
