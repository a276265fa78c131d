package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageCodec.{decode, dhash64, encodeBmp, encodeJpeg, encodePgm, encodePng, resizeNearest, toGray, Image}

/** The real image codec paths: BMP/PGM round-trips (pure byte
  * parsing), PNG/JPEG/GIF via the JDK's javax.imageio, padding,
  * top-down BMPs, nearest-neighbor resize, and the decode dispatch
  * inside MediaCodec (pixels for images, raw bytes otherwise). */
class ImageCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, c: Int): Image =
    Image(w, h, c, Array.tabulate(w * h * c)(i => (i * 7 % 251).toByte))

  test("BMP 24bpp round-trips incl. non-multiple-of-4 row widths") {
    for (w <- Seq(1, 3, 5, 8); h <- Seq(1, 2, 7)) {
      val img = gradient(w, h, 3)
      val decoded = decode(encodeBmp(img))
      assert(decoded.contains(img), s"w=$w h=$h")
    }
  }

  test("top-down BMP (negative height) decodes to the same pixels") {
    val img = gradient(4, 3, 3)
    val bmp = encodeBmp(img)
    // flip to top-down: negate height, reorder rows in place
    val b = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(22, -3)
    val rowBytes = (4 * 3 + 3) & ~3
    val rows = (0 until 3).map(r =>
      java.util.Arrays.copyOfRange(bmp, 54 + r * rowBytes, 54 + (r + 1) * rowBytes))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, bmp, 54 + r * rowBytes, rowBytes)
    }
    assert(decode(bmp).contains(img))
  }

  test("PGM P5 round-trips, with comments and size checks") {
    val img = gradient(6, 4, 1)
    assert(decode(encodePgm(img)).contains(img))
    val withComment = ("P5\n# a comment\n6 4\n255\n").getBytes("US-ASCII") ++ img.data
    assert(decode(withComment).contains(img))
    // truncated data → reject
    assert(decode(encodePgm(img).dropRight(1)).isEmpty)
  }

  test("non-image payloads are not decoded") {
    assert(decode("plain text".getBytes("UTF-8")).isEmpty)
    assert(decode(Array[Byte]('B', 'M')).isEmpty) // too short for a header
    assert(decode(null).isEmpty)
  }

  test("nearest-neighbor resize: exact on integer ratios, corners stable") {
    val img = gradient(4, 4, 3)
    val up = resizeNearest(img, 8, 8)
    // each source pixel becomes a 2x2 block
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      assert(up.data((y * 8 + x) * 3 + c) === img.data(((y / 2) * 4 + x / 2) * 3 + c))
    val down = resizeNearest(up, 4, 4)
    assert(down === img)
  }

  test("grayscale conversion bounds and determinism") {
    val img = gradient(5, 5, 3)
    val g = toGray(img)
    assert(g.channels === 1 && g.data.length === 25)
    assert(toGray(img) === g)
  }

  test("MediaCodec features compute over decoded pixels for images") {
    val img = Image(2, 2, 1, Array[Byte](10, 10, 20, 30))
    val pgm = encodePgm(img)
    val f = MultimodalOps.MediaCodec.features(1L, pgm)
    // decoded: 4 pixel bytes, 3 distinct — NOT the header bytes
    assert(f.n_bytes === 4)
    assert(f.n_distinct_bytes === 3)
    // non-image payloads keep the raw-byte stub semantics
    val f2 = MultimodalOps.MediaCodec.features(2L, "aabb".getBytes("UTF-8"))
    assert(f2.n_bytes === 4 && f2.n_distinct_bytes === 2)
  }

  test("PNG round-trips bit-exactly, gray and BGR (lossless codec)") {
    // gray: raster samples must survive encode → zlib → PNG filters →
    // decode untouched; every byte value 0-255 appears in a 16x16 ramp
    val gray = Image(16, 16, 1, Array.tabulate(256)(_.toByte))
    assert(decode(encodePng(gray)).contains(gray))
    // BGR: band-ordered raster read must reassemble our interleaved
    // layout exactly
    val bgr = gradient(7, 5, 3) // odd width: no stride alignment luck
    assert(decode(encodePng(bgr)).contains(bgr))
    // double round-trip (the mm_png_decode pipeline shape)
    assert(decode(encodePng(decode(encodePng(bgr)).get)).contains(bgr))
  }

  test("JPEG decodes via ImageIO: right shape, pixels near the source") {
    // JPEG is lossy and its IDCT output is decoder-dependent, so this
    // is a tolerance pin, NOT an oracle: a flat mid-gray image must
    // come back flat and close (DCT is exact on constant blocks up to
    // rounding), and a smooth gradient must come back within a small
    // per-pixel error.
    val flat = Image(16, 16, 1, Array.fill(256)(119.toByte))
    val df = decode(encodeJpeg(flat)).get
    assert(df.width === 16 && df.height === 16 && df.channels === 1)
    assert(df.data.forall(b => math.abs((b & 0xff) - 119) <= 2))
    val smooth = Image(16, 16, 3,
      Array.tabulate(16 * 16 * 3)(i => ((i / 3 / 16) * 12 + 40).toByte))
    val ds = decode(encodeJpeg(smooth)).get
    assert(ds.width === 16 && ds.height === 16 && ds.channels === 3)
    val maxErr = ds.data.zip(smooth.data)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 16, s"JPEG round-trip drifted $maxErr levels on a smooth ramp")
  }

  test("GIF (palette-indexed) decodes to true color, not palette indices") {
    // write a 2-color GIF through ImageIO from an indexed image: if
    // decode returned raster samples directly it would yield indices
    // 0/1 — the palette expansion must yield the actual colors
    val bi = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
      new java.awt.image.IndexColorModel(1, 2,
        Array[Byte](10.toByte, 200.toByte), // r
        Array[Byte](20.toByte, 210.toByte), // g
        Array[Byte](30.toByte, 220.toByte))) // b
    for (x <- 0 until 4; y <- 0 until 2)
      bi.setRGB(x, y, if ((x + y) % 2 == 0) bi.getColorModel.getRGB(0)
        else bi.getColorModel.getRGB(1))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", out))
    val img = decode(out.toByteArray).get
    assert(img.channels === 3 && img.width === 4 && img.height === 2)
    val p0 = (img.data(0) & 0xff, img.data(1) & 0xff, img.data(2) & 0xff)
    assert(p0 === ((30, 20, 10)), s"expected BGR of palette color 0, got $p0")
    val p1 = (img.data(3) & 0xff, img.data(4) & 0xff, img.data(5) & 0xff)
    assert(p1 === ((220, 210, 200)), s"expected BGR of palette color 1, got $p1")
  }

  test("MediaCodec features see decoded pixels for PNG payloads") {
    val img = Image(2, 2, 1, Array[Byte](10, 10, 20, 30))
    val f = MultimodalOps.MediaCodec.features(1L, encodePng(img))
    // identical to the PGM case: 4 pixel bytes, 3 distinct — NOT the
    // compressed PNG container bytes
    assert(f.n_bytes === 4 && f.n_distinct_bytes === 3)
  }

  test("resizeImages end-to-end over a mixed DataFrame") {
    val spark = graft.sources.SparkTestSession.spark
    import spark.implicits._
    val img = gradient(6, 6, 3)
    val rows = Seq(
      (1L, encodeBmp(img)),
      (2L, "not an image".getBytes("UTF-8")))
    val media = rows.toDF("id", "media")
    val out = MultimodalOps.resizeImages(spark, media, 3, 3).collect()
    assert(out.length === 1) // the non-image row is dropped
    val r = out.head
    assert(r.getAs[Long]("id") === 1L)
    assert(r.getAs[Int]("width") === 3 && r.getAs[Int]("orig_width") === 6)
    val back = decode(r.getAs[Array[Byte]]("media"))
    assert(back.contains(resizeNearest(img, 3, 3)))
  }

  test("16-bit PNG is rejected (outside the 8-bit real-decode contract), not truncated") {
    // a 16-bit gray PNG decodes via ImageIO to 0..65535 samples;
    // .toByte truncation would silently return garbage pixels as a
    // successful "real" decode — the contract is None → stub
    val bi = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    bi.getRaster.setSample(1, 1, 0, 0x0100) // low byte 0, high byte 1
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    assert(decode(bos.toByteArray).isEmpty)
  }

  test("gray+alpha PNG decodes as gray (alpha dropped), matching the RGBA doctrine") {
    val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(3, 2)
    (0 until 3).foreach { x =>
      (0 until 2).foreach { y =>
        raster.setSample(x, y, 0, 10 * (y * 3 + x)) // gray
        raster.setSample(x, y, 1, 200)              // alpha
      }
    }
    val bi = new java.awt.image.BufferedImage(cm, raster, false, null)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val img = decode(bos.toByteArray)
    assert(img.isDefined, "gray+alpha PNG must decode, not fall to the stub")
    assert(img.get.channels === 1 && img.get.width === 3 && img.get.height === 2)
    assert(img.get.data.toSeq === Seq(0, 10, 20, 30, 40, 50).map(_.toByte))
  }

  test("dhash64: brighter-left bits in row-major comparison order; grid contract enforced") {
    // all-equal pixels -> no bit set; a single brighter pixel at
    // (r=0, c=0) sets exactly bit 0 (the comparison against c=1)
    val flat = Array.fill[Byte](72)(50)
    assert(dhash64(Image(9, 8, 1, flat)) === 0L)
    val one = flat.clone(); one(0) = 100.toByte
    assert(dhash64(Image(9, 8, 1, one)) === 1L)
    // brighter pixel at (r=2, c=3): bit r*8+c = 19 set (left of c=4),
    // and bit 18 CLEARED comparison (c=2 vs brighter c=3) stays 0
    val mid = flat.clone(); mid(2 * 9 + 3) = 200.toByte
    assert(dhash64(Image(9, 8, 1, mid)) === (1L << 19))
    // unsigned byte comparison: 0xFF (=-1 signed) is BRIGHTER than 1
    val ub = flat.clone(); ub(0) = 0xFF.toByte; ub(1) = 1
    assert((dhash64(Image(9, 8, 1, ub)) & 1L) === 1L)
    // grid contract: (w-1)*h must be 64 and grayscale only
    intercept[IllegalArgumentException](dhash64(Image(8, 8, 1, Array.fill[Byte](64)(0))))
    intercept[IllegalArgumentException](dhash64(Image(9, 8, 3, Array.fill[Byte](216)(0))))
  }
}
