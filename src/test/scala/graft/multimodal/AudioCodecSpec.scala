package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.AudioCodec.{decode, encodeWav, resampleLinear, toMono, zeroCrossings, Audio}

/** The library-free RIFF/WAVE PCM codec: 16-bit round-trips, 8-bit
  * widening, chunk-list walking (extra chunks before data, word
  * alignment), loud rejects, and the mono/zero-crossing kernels the
  * mm_wav_decode gate leans on. */
class AudioCodecSpec extends AnyFunSuite {

  private def ramp(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 1103) % 65536 - 32768).toShort)

  test("16-bit PCM round-trips bit-exactly, mono and stereo") {
    val mono = Audio(8000, 1, ramp(31)) // odd count: no luck alignment
    assert(decode(encodeWav(mono)).contains(mono))
    val stereo = Audio(44100, 2, ramp(64))
    assert(decode(encodeWav(stereo)).contains(stereo))
  }

  test("chunk walking: extra chunk between fmt and data, odd-length word alignment") {
    val a = Audio(16000, 1, ramp(8))
    val wav = encodeWav(a)
    // splice a 3-byte junk chunk (odd length → 1 pad byte) after fmt
    val fmtEnd = 12 + 8 + 16
    val junk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x4b4e554a).putInt(3).put(Array[Byte](1, 2, 3, 0)).array()
    val spliced = wav.take(fmtEnd) ++ junk ++ wav.drop(fmtEnd)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(decode(spliced).contains(a), "junk chunk before data must be skipped")
  }

  test("8-bit PCM widens to centered 16-bit") {
    val a = Audio(8000, 1, Array[Short](0, 0))
    val wav = encodeWav(a)
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(12 + 8 + 14, 8) // bits per sample → 8
    bb.putInt(12 + 8 + 8, 8000) // byte rate = rate * 1ch * 1B
    bb.putShort(12 + 8 + 12, 1) // block align
    // data: two unsigned bytes 128 (center) and 255 (max)
    bb.putInt(40, 2)
    val trimmed = java.util.Arrays.copyOf(wav, 46)
    trimmed(44) = 128.toByte
    trimmed(45) = 255.toByte
    val bb2 = java.nio.ByteBuffer.wrap(trimmed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(4, trimmed.length - 8)
    val got = decode(trimmed)
    assert(got.isDefined)
    assert(got.get.samples.toSeq === Seq[Short](0, (127 << 8).toShort))
  }

  test("rejects: non-PCM tag, truncated data, ragged sample count, non-audio") {
    val a = Audio(8000, 2, ramp(4))
    val wav = encodeWav(a)
    val mulaw = wav.clone()
    java.nio.ByteBuffer.wrap(mulaw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 7) // µ-law format tag
    assert(decode(mulaw).isEmpty)
    assert(decode(wav.dropRight(1)).isEmpty, "truncated data chunk")
    assert(decode("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(decode(null).isEmpty)
    // stereo data of 3 bytes cannot split into whole 16-bit frames
    val ragged = wav.clone()
    java.nio.ByteBuffer.wrap(ragged).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 3)
    assert(decode(java.util.Arrays.copyOf(ragged, 47)).isEmpty)
  }

  test("MediaCodec features see decoded PCM bytes for WAV payloads") {
    val a = Audio(8000, 1, Array[Short](0x0102, 0x0102))
    val f = MultimodalOps.MediaCodec.features(1L, encodeWav(a))
    // 2 samples → 4 PCM bytes (02 01 02 01): 2 distinct — NOT the
    // 48-byte container
    assert(f.n_bytes === 4 && f.n_distinct_bytes === 2)
  }

  test("hostile chunk length near Int.MaxValue is rejected, not wrapped") {
    // len = 0x7FFFFFF0 makes `pos + 8 + len` wrap negative in int
    // arithmetic, slipping past the bounds check and crashing the walk
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, 0x46464952).putInt(4, 56).putInt(8, 0x45564157)
    b.putInt(12, 0x61746164 /* data */).putInt(16, 0x7FFFFFF0)
    assert(decode(b.array()).isEmpty) // must return None, never throw
  }

  test("resampleLinear: identity at equal rates, exact midpoints, endpoint preservation") {
    val a = Audio(8000, 1, Array[Short](0, 300, -600, 900))
    // same rate in == out: every grid point lands on an input sample
    assert(resampleLinear(a, 8000).samples.toSeq === a.samples.toSeq)
    // 2x upsample: midpoints are exact integer averages with
    // TRUNCATING division ((300 + -600)/2 = -150, (-600+900)/2 = 150)
    val up = resampleLinear(a, 16000)
    assert(up.sampleRate === 16000)
    assert(up.samples.toSeq === Seq[Short](0, 150, 300, -150, -600, 150, 900))
    // the last output is exactly the last input (nOut math keeps the
    // grid inside the signal)
    assert(up.samples.last === a.samples.last)
    // 3:2 downsample-ish grid hits thirds: pos 2/3 of the way from
    // 0->300 with truncation toward zero: (0*1 + 300*2)/3 = 200
    val r = resampleLinear(Audio(8000, 1, Array[Short](0, 300)), 12000)
    assert(r.samples.toSeq === Seq[Short](0, 200))
    // negative interpolants truncate toward zero (the DuckDB // rule),
    // NOT floor: (0*1 + -301*2)/3 = -200 (floor would give -201)
    val neg = resampleLinear(Audio(8000, 1, Array[Short](0, -301)), 12000)
    assert(neg.samples.toSeq === Seq[Short](0, -200))
    // mono contract
    intercept[IllegalArgumentException] {
      resampleLinear(Audio(8000, 2, Array[Short](1, 2)), 12000)
    }
    assert(resampleLinear(Audio(8000, 1, Array.empty[Short]), 12000).samples.isEmpty)
  }

  test("toMono averages with toward-zero truncation; zero crossings count strict sign flips") {
    val st = Audio(8000, 2, Array[Short](100, -301, 5, 6))
    assert(toMono(st).samples.toSeq === Seq[Short](-100, 5))
    // -100 → 5 is one flip; 0 counts as non-negative
    assert(zeroCrossings(Audio(8000, 1, Array[Short](-1, 0, 1, -2, 3))) === 3)
    assert(zeroCrossings(st) === 1)
  }
}
