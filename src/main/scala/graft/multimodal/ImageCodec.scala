package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL image decode/encode for the two formats that need no codec
  * library: uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) and
  * binary PGM (P5, maxval ≤ 255). This upgrades the multimodal decode
  * seam from "deterministic stub only" to real pixels for
  * uncompressed payloads; compressed codecs (JPEG/PNG/audio) stay
  * stubbed because the container ships no codec libraries.
  *
  * Pixel layout: row-major, top-down; `channels` ∈ 1 (gray) or 3
  * (BGR, as stored by BMP).
  */
object ImageCodec {

  final case class Image(width: Int, height: Int, channels: Int, data: Array[Byte]) {
    require(data.length == width * height * channels, "pixel buffer size mismatch")
    // value equality incl. the pixel array (case-class default compares
    // Array by reference)
    override def equals(o: Any): Boolean = o match {
      case Image(w, h, c, d) => w == width && h == height && c == channels &&
        java.util.Arrays.equals(d, data)
      case _ => false
    }
    override def hashCode: Int =
      ((width * 31 + height) * 31 + channels) * 31 + java.util.Arrays.hashCode(data)
  }

  /** Decode if the payload is a supported uncompressed image. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '5') decodePgm(bytes)
    else None
  }

  // ---- BMP (24bpp, BI_RGB, BITMAPINFOHEADER) -------------------------

  private def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 54) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val dibSize = b.getInt(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    if (width <= 0 || rawHeight == 0 || bpp != 24 || compression != 0) return None
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rowBytes = (width * 3 + 3) & ~3 // rows padded to 4 bytes
    if (dataOffset.toLong + rowBytes.toLong * height > bytes.length) return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(bytes, dataOffset + srcRow * rowBytes, out, y * width * 3, width * 3)
      y += 1
    }
    Some(Image(width, height, 3, out))
  }

  /** Encode 3-channel BGR (or 1-channel gray expanded to BGR) as a
    * bottom-up 24bpp BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataSize = rowBytes * img.height
    val total = 54 + dataSize
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        if (img.channels == 3) {
          val p = (y * img.width + x) * 3
          b.put(img.data(p)).put(img.data(p + 1)).put(img.data(p + 2))
        } else {
          val g = img.data(y * img.width + x)
          b.put(g).put(g).put(g)
        }
        x += 1
      }
      var pad = rowBytes - img.width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  // ---- PGM (P5 binary, maxval <= 255) --------------------------------

  private def decodePgm(bytes: Array[Byte]): Option[Image] = {
    // header: "P5" <ws> width <ws> height <ws> maxval <single ws> data;
    // '#' comments run to end of line
    var pos = 2
    def skipWs(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    pos += 1 // exactly one whitespace separates header from data
    if (pos.toLong + w.toLong * h > bytes.length) return None
    Some(Image(w, h, 1, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h)))
  }

  def encodePgm(img: Image): Array[Byte] = {
    require(img.channels == 1, "PGM is grayscale")
    val header = s"P5\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.data.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.data, 0, out, header.length, img.data.length)
    out
  }

  // ---- transforms ----------------------------------------------------

  /** Nearest-neighbor resize (the standard cheap image-pipeline
    * transform; deterministic integer source mapping). */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, "target dims must be positive")
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        var c = 0
        while (c < img.channels) {
          out((y * w + x) * img.channels + c) =
            img.data((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }

  /** BGR → gray (integer BT.601-ish weights 29/150/77 out of 256). */
  def toGray(img: Image): Image = {
    if (img.channels == 1) img
    else {
      val out = new Array[Byte](img.width * img.height)
      var i = 0
      while (i < out.length) {
        val p = i * 3
        val bch = img.data(p) & 0xff
        val g = img.data(p + 1) & 0xff
        val r = img.data(p + 2) & 0xff
        out(i) = ((29 * bch + 150 * g + 77 * r) >> 8).toByte
        i += 1
      }
      Image(img.width, img.height, 1, out)
    }
  }
}
