package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio decode/encode for the one format that needs no codec
  * library: RIFF/WAVE carrying integer PCM (format tag 1, 8- or
  * 16-bit). Pure byte parsing, same tier as the BMP/PGM image paths —
  * this retires the "audio stays stubbed" caveat for the PCM case;
  * compressed audio (MP3/AAC/Opus) has no JDK decoder and keeps the
  * deterministic byte-histogram stub.
  *
  * Samples are interleaved by channel, 16-bit signed (8-bit input is
  * centered and widened: (b - 128) << 8), frame-major — the layout a
  * feature extractor walks.
  */
object AudioCodec {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0,
      "sample buffer must hold whole frames")
    override def equals(o: Any): Boolean = o match {
      case Audio(r, c, s) => r == sampleRate && c == channels &&
        java.util.Arrays.equals(s, samples)
      case _ => false
    }
    override def hashCode: Int =
      (sampleRate * 31 + channels) * 31 + java.util.Arrays.hashCode(samples)
  }

  /** Decode if the payload is RIFF/WAVE integer PCM. Walks the chunk
    * list (fmt may be followed by fact/LIST/etc before data); rejects
    * non-PCM format tags, byte counts that do not divide into whole
    * samples, and truncated chunks. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.getInt(0) != 0x46464952 /* "RIFF" */ ||
      b.getInt(8) != 0x45564157 /* "WAVE" */ ) return None
    var pos = 12
    var fmtTag = -1
    var channels = 0
    var rate = 0
    var bits = 0
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length && (fmtTag < 0 || data == null)) {
      val id = b.getInt(pos)
      val len = b.getInt(pos + 4)
      // long arithmetic: a hostile len near Int.MaxValue would wrap
      // `pos + 8 + len` negative and slip past an int comparison
      if (len < 0 || pos.toLong + 8L + len > bytes.length) return None
      if (id == 0x20746d66 /* "fmt " */ && len >= 16) {
        fmtTag = b.getShort(pos + 8) & 0xffff
        channels = b.getShort(pos + 10) & 0xffff
        rate = b.getInt(pos + 12)
        bits = b.getShort(pos + 22) & 0xffff
      } else if (id == 0x61746164 /* "data" */ ) {
        data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtTag != 1 || data == null || channels <= 0 || rate <= 0) return None
    bits match {
      case 16 =>
        if (data.length % (2 * channels) != 0) return None
        val out = new Array[Short](data.length / 2)
        val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < out.length) { out(i) = db.getShort(i * 2); i += 1 }
        Some(Audio(rate, channels, out))
      case 8 =>
        if (data.length % channels != 0) return None
        val out = new Array[Short](data.length)
        var i = 0
        while (i < out.length) {
          out(i) = (((data(i) & 0xff) - 128) << 8).toShort
          i += 1
        }
        Some(Audio(rate, channels, out))
      case _ => None
    }
  }

  /** Encode as canonical 44-byte-header 16-bit PCM WAV
    * (decode(encode(a)) == a). */
  /** The samples as the 16-bit-LE PCM byte stream (the `data` chunk
    * payload) — the one serialization shared by feature extraction and
    * the wav-decode gate, so a future sample-layout change cannot make
    * them silently disagree. */
  def pcmBytes(a: Audio): Array[Byte] = {
    val le = new Array[Byte](a.samples.length * 2)
    val bb = ByteBuffer.wrap(le).order(ByteOrder.LITTLE_ENDIAN)
    a.samples.foreach(bb.putShort)
    le
  }

  def encodeWav(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    b.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2) // byte rate
      .putShort((a.channels * 2).toShort) // block align
      .putShort(16)
    b.putInt(0x61746164).putInt(dataLen)
    var i = 0
    while (i < a.samples.length) { b.putShort(a.samples(i)); i += 1 }
    b.array()
  }

  // ---- transforms ----------------------------------------------------

  /** Mix interleaved channels down to mono (average, toward-zero
    * truncation — deterministic integer math). */
  def toMono(a: Audio): Audio = {
    if (a.channels == 1) a
    else {
      val frames = a.samples.length / a.channels
      val out = new Array[Short](frames)
      var f = 0
      while (f < frames) {
        var acc = 0
        var c = 0
        while (c < a.channels) { acc += a.samples(f * a.channels + c); c += 1 }
        out(f) = (acc / a.channels).toShort
        f += 1
      }
      Audio(a.sampleRate, 1, out)
    }
  }

  /** Zero-crossing count over a mono view — the classic cheap
    * voiced/unvoiced signal feature. */
  /** Linear-interpolation resample to `outRate` — EXACT integer
    * arithmetic throughout so the result is engine-independent: output
    * sample k sits at input position k·inRate/outRate (an exact
    * rational), i = the truncating integer quotient, and the
    * interpolated value (s_i·(den−rem) + s_{i+1}·rem) / den uses
    * TRUNCATING division (Scala's Long `/`), which is what DuckDB's
    * `//` does on negatives too (floorDiv is NOT — it differs on
    * negative interpolants). nOut = (n−1)·outRate/inRate + 1 keeps
    * every interpolation inside the input (the last output lands
    * exactly on the last input sample or earlier). Mono PCM only —
    * resampling interleaved channels independently is a `toMono`
    * composition away. */
  def resampleLinear(a: Audio, outRate: Int): Audio = {
    require(outRate > 0, s"outRate must be positive, got $outRate")
    require(a.channels == 1, "resampleLinear expects mono PCM (compose with toMono)")
    val n = a.samples.length
    if (n == 0) Audio(outRate, a.channels, Array.empty)
    else {
      val den = outRate.toLong
      val nOut = ((n - 1).toLong * outRate / a.sampleRate + 1).toInt
      val out = new Array[Short](nOut)
      var k = 0
      while (k < nOut) {
        val num = k.toLong * a.sampleRate
        val i = (num / den).toInt
        val rem = num % den
        val v =
          if (rem == 0L) a.samples(i).toLong
          else (a.samples(i).toLong * (den - rem) + a.samples(i + 1).toLong * rem) / den
        out(k) = v.toShort
        k += 1
      }
      Audio(outRate, a.channels, out)
    }
  }

  def zeroCrossings(a: Audio): Int = {
    val m = toMono(a)
    var n = 0
    var i = 1
    while (i < m.samples.length) {
      if ((m.samples(i - 1) < 0) != (m.samples(i) < 0)) n += 1
      i += 1
    }
    n
  }
}
