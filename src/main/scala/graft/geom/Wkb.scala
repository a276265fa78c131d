package graft.geom

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal WKB (well-known binary) builders — Spark has no native
  * geometry type, so geometries are surfaced as `BINARY` WKB plus a
  * `geom_type` string column (SURVEY §7.3 risk 5). Little-endian,
  * standard ISO type codes. Mirrors the role of the reference's shapely
  * constructors (reference _geometry.py:8-106) without a geo dependency.
  */
object Wkb {

  final case class Coord(x: Double, y: Double)

  private def buf(capacity: Int): ByteBuffer =
    ByteBuffer.allocate(capacity).order(ByteOrder.LITTLE_ENDIAN)

  def point(x: Double, y: Double): Array[Byte] = {
    val b = buf(21)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  def lineString(coords: Seq[Coord]): Array[Byte] = {
    val b = buf(9 + 16 * coords.length)
    b.put(1.toByte).putInt(2).putInt(coords.length)
    coords.foreach(c => b.putDouble(c.x).putDouble(c.y))
    b.array()
  }

  /** rings: first = shell, rest = holes; each ring must be closed. */
  def polygon(rings: Seq[Seq[Coord]]): Array[Byte] = {
    val n = 9 + rings.map(r => 4 + 16 * r.length).sum
    val b = buf(n)
    b.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { r =>
      b.putInt(r.length)
      r.foreach(c => b.putDouble(c.x).putDouble(c.y))
    }
    b.array()
  }

  private def collection(typeCode: Int, parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val head = buf(9)
    head.put(1.toByte).putInt(typeCode).putInt(parts.length)
    out.write(head.array())
    parts.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  def multiPoint(points: Seq[Array[Byte]]): Array[Byte] = collection(4, points)
  def multiLineString(lines: Seq[Array[Byte]]): Array[Byte] = collection(5, lines)
  def multiPolygon(polys: Seq[Array[Byte]]): Array[Byte] = collection(6, polys)

  // ---- tiny reader (tests / debugging only) ----

  def geomType(wkb: Array[Byte]): Int =
    ByteBuffer.wrap(wkb, 1, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  def readPoint(wkb: Array[Byte]): Coord = {
    val b = ByteBuffer.wrap(wkb).order(ByteOrder.LITTLE_ENDIAN)
    b.position(5)
    Coord(b.getDouble, b.getDouble)
  }

  def readLineString(wkb: Array[Byte]): Seq[Coord] = {
    val b = ByteBuffer.wrap(wkb).order(ByteOrder.LITTLE_ENDIAN)
    b.position(5)
    val n = b.getInt
    (0 until n).map(_ => Coord(b.getDouble, b.getDouble))
  }

  def readPolygon(wkb: Array[Byte]): Seq[Seq[Coord]] = {
    val b = ByteBuffer.wrap(wkb).order(ByteOrder.LITTLE_ENDIAN)
    b.position(5)
    val nRings = b.getInt
    (0 until nRings).map { _ =>
      val n = b.getInt
      (0 until n).map(_ => Coord(b.getDouble, b.getDouble))
    }
  }

  /** Parts of a collection as standalone WKB blobs. */
  def readCollection(wkb: Array[Byte]): Seq[Array[Byte]] = {
    val b = ByteBuffer.wrap(wkb).order(ByteOrder.LITTLE_ENDIAN)
    b.position(5)
    val n = b.getInt
    (0 until n).map { _ =>
      val start = b.position()
      b.position(start + 1)
      val tc = b.getInt
      val len = tc match {
        case 1 => 21
        case 2 => { val np = b.getInt; 9 + 16 * np }
        case 3 =>
          val nr = b.getInt
          var l = 9
          (0 until nr).foreach { _ =>
            val np = b.getInt
            l += 4 + 16 * np
            b.position(b.position() + 16 * np)
          }
          l
        case other => throw new IllegalArgumentException(s"nested type $other")
      }
      b.position(start)
      val part = new Array[Byte](len)
      b.get(part)
      part
    }
  }
}
