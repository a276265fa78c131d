package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioCodec.Audio

/** FlacCodec contract:
  *  - LOSSLESS round trip decode(encodeFlac(a)) == a over randomized
  *    PCM (smooth signals → FIXED subframes, white noise → VERBATIM,
  *    silence/DC → CONSTANT — all three encoder paths land in the
  *    property corpus), mono and stereo;
  *  - decode of an INDEPENDENTLY hand-built stream (a bit-writer local
  *    to this spec, following the published format) — guards against
  *    compensating encode/decode bugs that a round trip alone cannot
  *    see;
  *  - malformed streams return None, never garbage (ErrorPathSpec
  *    style): bad marker, truncation, corrupted header CRC, corrupted
  *    payload (frame CRC-16), out-of-subset LPC subframe. */
class FlacCodecSpec extends AnyFunSuite {

  private def rt(a: Audio): Unit = {
    val enc = FlacCodec.encodeFlac(a)
    val dec = FlacCodec.decode(enc)
    assert(dec.isDefined, "decode failed on own encoder output")
    assert(dec.get === a)
  }

  test("round trip: constant, smooth (fixed), noise (verbatim), mono + stereo") {
    rt(Audio(8000, 1, Array.fill(32)(0.toShort)))            // CONSTANT silence
    rt(Audio(8000, 1, Array.fill(32)(-1234.toShort)))        // CONSTANT DC
    rt(Audio(44100, 1, Array.tabulate(64)(i =>               // linear ramp → FIXED
      (i * 100 - 3000).toShort)))
    rt(Audio(16000, 1, Array.tabulate(100)(i =>              // sine-ish → FIXED
      (8000 * math.sin(i * 0.2)).toShort)))
    val rnd = new scala.util.Random(0xF1AC)
    rt(Audio(8000, 1, Array.fill(128)(rnd.nextInt(65536).toShort))) // noise → VERBATIM
    rt(Audio(8000, 2, Array.tabulate(64)(i =>                // stereo interleaved
      (if (i % 2 == 0) i * 50 else -i * 30).toShort)))
    rt(Audio(8000, 1, Array(Short.MinValue, Short.MaxValue, 0, -1, 1))) // extremes
    rt(Audio(8000, 1, Array(42.toShort)))                    // single sample
  }

  test("sub-16-sample streams declare spec-conformant block sizes and round-trip") {
    // FLAC requires STREAMINFO min/max block size >= 16; a shorter
    // last-frame is legal, a shorter DECLARED bound is not (ADVICE
    // r18). STREAMINFO starts at byte 8: min block size is bytes
    // 8-9 big-endian, max is bytes 10-11.
    for (n <- Seq(1, 4, 15, 16, 17)) {
      val a = Audio(8000, 1, Array.tabulate(n)(i => (i * 7 - 20).toShort))
      val enc = FlacCodec.encodeFlac(a)
      def be16(off: Int): Int = ((enc(off) & 0xff) << 8) | (enc(off + 1) & 0xff)
      assert(be16(8) >= 16, s"declared min block size ${be16(8)} < 16 at n=$n")
      assert(be16(10) >= 16, s"declared max block size ${be16(10)} < 16 at n=$n")
      assert(be16(10) >= be16(8))
      assert(FlacCodec.decode(enc).contains(a))
    }
  }

  test("property: 200 random PCM buffers round-trip bit-exactly") {
    val rnd = new scala.util.Random(0x51AC)
    (0 until 200).foreach { k =>
      val ch = 1 + (k % 2)
      val frames = 1 + rnd.nextInt(200)
      // mix of smooth and noisy segments so order selection varies
      val smooth = rnd.nextBoolean()
      val s = Array.tabulate(frames * ch) { i =>
        if (smooth) ((i * (3 + k % 7)) % 5000 - 2500).toShort
        else rnd.nextInt(65536).toShort
      }
      rt(Audio(8000 + k, ch, s))
    }
  }

  test("decodes an independently hand-built constant-subframe stream") {
    // built with a LOCAL bit writer straight from the published
    // format — not FlacCodec's writer — so a compensating
    // encoder/decoder bug cannot hide
    val bits = new StringBuilder
    def put(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits.append((v >> i) & 1L))
    def bytesOf(sb: StringBuilder): Array[Byte] = {
      val padded = sb.toString + "0" * ((8 - sb.length % 8) % 8)
      padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    }
    // STREAMINFO: rate 8000, mono, 16-bit, 4 samples
    put(0x80, 8); put(34, 24)
    put(4, 16); put(4, 16); put(0, 24); put(0, 24)
    put(8000, 20); put(0, 3); put(15, 5); put(4, 36)
    (0 until 16).foreach(_ => put(0, 8))
    val meta = bytesOf(bits)
    // frame: sync, fixed strategy, blocksize code 0110 (8-bit n-1),
    // rate from streaminfo, mono, 16-bit, frame#0, blocksize-1=3
    val fb = new StringBuilder
    def putf(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => fb.append((v >> i) & 1L))
    putf(0x3ffe, 14); putf(0, 1); putf(0, 1)
    putf(6, 4); putf(0, 4); putf(0, 4); putf(4, 3); putf(0, 1)
    putf(0, 8) // frame number 0
    putf(3, 8) // blocksize - 1
    val hdr = bytesOf(fb)
    def crc8(bs: Array[Byte]): Int = {
      var c = 0
      bs.foreach { b =>
        c ^= b & 0xff
        (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
      }
      c
    }
    val fb2 = new StringBuilder(fb.toString)
    def putf2(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => fb2.append((v >> i) & 1L))
    putf2(crc8(hdr), 8)
    // CONSTANT subframe, value -7
    putf2(0, 1); putf2(0, 6); putf2(0, 1); putf2((-7L) & 0xffff, 16)
    // align + CRC16 over the whole frame
    while (fb2.length % 8 != 0) fb2.append('0')
    val frameNoCrc = bytesOf(fb2)
    def crc16(bs: Array[Byte]): Int = {
      var c = 0
      bs.foreach { b =>
        c ^= (b & 0xff) << 8
        (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
      }
      c
    }
    putf2(crc16(frameNoCrc), 16)
    val stream = "fLaC".getBytes("US-ASCII") ++ meta ++ bytesOf(fb2)
    val dec = FlacCodec.decode(stream)
    assert(dec.isDefined, "hand-built stream rejected")
    assert(dec.get === Audio(8000, 1, Array[Short](-7, -7, -7, -7)))
  }

  test("malformed streams return None, never garbage") {
    val good = FlacCodec.encodeFlac(
      Audio(8000, 1, Array.tabulate(32)(i => (i * 321 - 5000).toShort)))
    assert(FlacCodec.decode(good).isDefined)
    // bad marker
    val m = good.clone(); m(0) = 'g'.toByte
    assert(FlacCodec.decode(m).isEmpty)
    // truncations at every interesting boundary
    Seq(3, 20, 41, good.length / 2, good.length - 1).foreach { cut =>
      assert(FlacCodec.decode(good.take(cut)).isEmpty, s"truncation at $cut decoded")
    }
    // corrupt one byte of the frame HEADER (CRC-8 must catch it):
    // byte 42+4 sits inside the frame header for this layout
    val h = good.clone(); h(46) = (h(46) ^ 0x40).toByte
    assert(FlacCodec.decode(h).isEmpty, "header corruption slipped past CRC-8")
    // corrupt one byte of the PAYLOAD (CRC-16 must catch it)
    val p = good.clone(); p(good.length - 5) = (p(good.length - 5) ^ 0x01).toByte
    assert(FlacCodec.decode(p).isEmpty, "payload corruption slipped past CRC-16")
    // empty / null / tiny
    assert(FlacCodec.decode(Array.empty[Byte]).isEmpty)
    assert(FlacCodec.decode(null).isEmpty)
    assert(FlacCodec.decode("fLaC".getBytes("US-ASCII")).isEmpty)
  }

  test("output-amplification bomb is rejected, not buffered to OOM") {
    // review r18: a CONSTANT frame expands ~26,000x, and
    // totalSamples=0 ("unknown") skips the end-of-stream count check —
    // so a ~25 KB stream of repeated max-blocksize constant frames
    // could balloon the output buffer unbounded. Build exactly that:
    // a valid 65,535-sample constant stream, totalSamples patched to
    // 0 (STREAMINFO has no CRC), frame section repeated 1100x
    // (≈72M samples > the 2^26 cap).
    val one = FlacCodec.encodeFlac(
      Audio(8000, 1, Array.fill(65535)(123.toShort)))
    assert(FlacCodec.decode(one).isDefined)
    val header = java.util.Arrays.copyOfRange(one, 0, 42)
    // total-samples field: bits 108..143 of the 34-byte STREAMINFO
    // (stream bytes 21 low nibble through 25)
    header(21) = (header(21) & 0xf0).toByte
    header(22) = 0; header(23) = 0; header(24) = 0; header(25) = 0
    val frame = java.util.Arrays.copyOfRange(one, 42, one.length)
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(header)
    (0 until 1100).foreach(_ => bomb.write(frame))
    // sanity: the patched header alone still decodes (totalSamples=0
    // legitimately means unknown)
    val single = new java.io.ByteArrayOutputStream()
    single.write(header); single.write(frame)
    assert(FlacCodec.decode(single.toByteArray).isDefined,
      "totalSamples=0 single-frame stream must stay decodable")
    assert(FlacCodec.decode(bomb.toByteArray).isEmpty,
      "amplification bomb decoded instead of hitting the sample cap")
  }
}
