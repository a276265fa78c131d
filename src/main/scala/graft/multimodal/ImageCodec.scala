package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL image decode/encode. Two tiers:
  *
  *  - pure byte parsing, no libraries: uncompressed 24-bit BMP
  *    (BITMAPINFOHEADER, BI_RGB) and binary PGM (P5, maxval ≤ 255);
  *  - `javax.imageio` (the JDK's own `java.desktop` module — present
  *    in this JVM, zero external dependencies): PNG, JPEG, GIF
  *    (VERDICT r10 task 3). PNG is lossless, so decode ∘ encode is
  *    bit-deterministic and safe for the DuckDB oracle
  *    (`mm_png_decode`); JPEG IDCT output is decoder-dependent, so
  *    JPEG stays out of the cross-engine oracle and is pinned by a
  *    tolerance-based golden spec instead (ImageCodecSpec). Audio
  *    codecs remain stubbed — no decoder ships with the JDK.
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

  /** Decode if the payload is a supported image format (magic-number
    * dispatch: BMP/PGM via the byte parsers, PNG/JPEG/GIF via
    * `javax.imageio`). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 3) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '5') decodePgm(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
      decodeImageIO(bytes) // PNG
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff)
      decodeImageIO(bytes) // JPEG
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      decodeImageIO(bytes) // GIF
    else None
  }

  // ---- PNG / JPEG / GIF via javax.imageio ----------------------------

  /** Decode through the JDK's ImageIO, normalizing to this object's
    * Image layout. Samples are read band-wise off the RASTER (no
    * ColorModel/ICC conversion path), so an 8-bit gray or RGB PNG
    * round-trips bit-exactly — PNG is lossless. A 1-band raster maps
    * to gray; anything else goes through per-band reads into BGR. */
  private[multimodal] def decodeImageIO(bytes: Array[Byte]): Option[Image] =
    try {
      val bi0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (bi0 == null) None
      else {
        // palette-indexed images (GIF, palette PNG) carry palette
        // INDICES in their 1-band raster — expand to true color first
        // (exact lookup, no resampling) so the band reads below see
        // real sample values
        val bi =
          if (!bi0.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) bi0
          else {
            val c = new java.awt.image.BufferedImage(bi0.getWidth, bi0.getHeight,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val gr = c.createGraphics()
            try gr.drawImage(bi0, 0, 0, null) finally gr.dispose()
            c
          }
        val w = bi.getWidth
        val h = bi.getHeight
        val raster = bi.getRaster
        // the real-decode contract is 8-bit samples: a 16-bit PNG would
        // silently truncate through .toByte below — reject it to the
        // deterministic stub instead of returning garbage as "decoded"
        val wide = (0 until raster.getNumBands)
          .exists(raster.getSampleModel.getSampleSize(_) > 8)
        if (wide) None
        else if (raster.getNumBands <= 2) {
          // 1 band = gray; 2 bands = gray+alpha (alpha dropped, same
          // doctrine as the RGBA path below)
          val samples = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
          val data = new Array[Byte](w * h)
          var i = 0
          while (i < data.length) { data(i) = samples(i).toByte; i += 1 }
          Some(Image(w, h, 1, data))
        } else {
          // band order in the raster follows the color model: 0=R 1=G
          // 2=B (alpha, if present, is dropped); our layout is BGR
          val r = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
          val g = raster.getSamples(0, 0, w, h, 1, null: Array[Int])
          val b = raster.getSamples(0, 0, w, h, 2, null: Array[Int])
          val data = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            data(i * 3) = b(i).toByte
            data(i * 3 + 1) = g(i).toByte
            data(i * 3 + 2) = r(i).toByte
            i += 1
          }
          Some(Image(w, h, 3, data))
        }
      }
    } catch { case _: Exception => None }

  private def toBufferedImage(img: Image): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    if (img.channels == 1) {
      val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_BYTE_GRAY)
      bi.getRaster.setDataElements(0, 0, img.width, img.height, img.data)
      bi
    } else {
      val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_3BYTE_BGR)
      // setDataElements takes per-pixel BAND-ordered tuples (R,G,B) —
      // ComponentSampleModel routes obj[i] through bandOffsets[i] —
      // not raw storage order, so our BGR layout must swap here
      val rgb = new Array[Byte](img.data.length)
      var i = 0
      while (i < img.width * img.height) {
        rgb(i * 3) = img.data(i * 3 + 2)
        rgb(i * 3 + 1) = img.data(i * 3 + 1)
        rgb(i * 3 + 2) = img.data(i * 3)
        i += 1
      }
      bi.getRaster.setDataElements(0, 0, img.width, img.height, rgb)
      bi
    }
  }

  private def encodeImageIO(img: Image, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(toBufferedImage(img), format, out),
      s"no ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Encode as PNG (lossless: decode(encodePng(img)) == img). */
  def encodePng(img: Image): Array[Byte] = encodeImageIO(img, "png")

  /** Encode as JPEG (LOSSY and decoder-dependent — never feed the
    * result into a cross-engine oracle; golden-spec only). */
  def encodeJpeg(img: Image): Array[Byte] = encodeImageIO(img, "jpg")

  /** Encode as GIF. Lossless ONLY when the image has ≤ 256 distinct
    * colors (always true for 8-bit gray — the JDK writer emits an
    * exact palette; the decode path resolves indices through the
    * palette, so a permuted-palette GIF still reads correctly);
    * a true-color image would be quantized — keep those on PNG. */
  def encodeGif(img: Image): Array[Byte] = encodeImageIO(img, "gif")

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
  /** dHash (difference hash) — the classic perceptual image
    * fingerprint: one bit per horizontally adjacent pixel pair,
    * set when the LEFT pixel is brighter. Requires a grayscale grid
    * with exactly 64 comparisons ((width−1)·height == 64 — the
    * canonical 9×8 thumbnail), which is what makes the result a
    * SimHash-shaped 64-bit key: hamming distance measures visual
    * difference and the lossless banding/sub-split pair machinery
    * applies unchanged. Bit index is row-major over comparisons. */
  def dhash64(img: Image): Long = {
    require(img.channels == 1, s"dhash64 expects grayscale, got ${img.channels} channels")
    require((img.width - 1) * img.height == 64,
      s"dhash64 needs (width-1)*height == 64 (e.g. 9x8), got ${img.width}x${img.height}")
    var h = 0L
    var bit = 0
    var r = 0
    while (r < img.height) {
      var c = 0
      while (c < img.width - 1) {
        if ((img.data(r * img.width + c) & 0xff) > (img.data(r * img.width + c + 1) & 0xff))
          h |= 1L << bit
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

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
