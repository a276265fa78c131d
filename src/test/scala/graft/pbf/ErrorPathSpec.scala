package graft.pbf

import org.scalatest.funsuite.AnyFunSuite

/** Framing/codec error semantics (reference headers.py:33-121:
  * unsupported codecs and features raise). We extend Q5: raw/zlib/lz4/
  * zstd supported, lzma(4) + obsolete bzip2(5) rejected. */
class ErrorPathSpec extends AnyFunSuite {

  test("unsupported blob compression (lzma, bzip2) is rejected") {
    Seq(4, 5).foreach { field =>
      val blob = new PbfWriter
      blob.writeVarintField(2, 10) // raw_size
      blob.writeBytes(field, Array[Byte](1, 2, 3))
      val e = intercept[UnsupportedOperationException] {
        OsmPbfFile.decodeBlob(blob.toBytes)
      }
      assert(e.getMessage.contains("compression"))
    }
  }

  test("truncated zlib stream errors instead of hanging or zero-padding") {
    val full = Zlib.deflate("hello pbf world, have some bytes".getBytes("UTF-8"))
    val truncated = java.util.Arrays.copyOf(full, full.length / 2)
    val e = intercept[IllegalArgumentException] {
      Zlib.inflate(truncated, 32)
    }
    assert(e.getMessage.contains("zlib"))
  }

  test("reader enforces message bounds on malformed input") {
    // varint whose continuation bit never clears within the buffer
    intercept[IllegalArgumentException] {
      new PbfReader(Array[Byte](0x80.toByte, 0x80.toByte)).readVarint()
    }
    // length-delimited field longer than the remaining buffer
    val w = new PbfWriter
    w.writeTag(1, 2)
    w.writeVarint(100) // declared length >> actual
    w.writeVarint(7)
    val r = new PbfReader(w.toBytes)
    r.readTag()
    intercept[IllegalArgumentException] { r.readBytes() }
  }

  test("empty blob is rejected") {
    val blob = new PbfWriter
    blob.writeVarintField(2, 10)
    intercept[IllegalArgumentException] {
      OsmPbfFile.decodeBlob(blob.toBytes)
    }
  }

  test("unknown required feature in OSMHeader is rejected") {
    val hb = new PbfWriter
    hb.writeString(4, "OsmSchema-V0.6")
    hb.writeString(4, "HistoricalInformation")
    val e = intercept[UnsupportedOperationException] {
      OsmPbfFile.validateHeader(hb.toBytes)
    }
    assert(e.getMessage.contains("HistoricalInformation"))
  }

  test("file without an OSMHeader blob is rejected") {
    val f = java.io.File.createTempFile("nohdr", ".osm.pbf")
    f.deleteOnExit()
    // write a file whose only blob is OSMData
    OsmPbfWriter.write(f.getAbsolutePath, Seq(Seq(OsmPbfWriter.N(1, 0, 0))))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // strip the header frame: find the second frame start
    val headerLen = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    // parse BlobHeader to get datasize
    val r = new PbfReader(java.util.Arrays.copyOfRange(bytes, 4, 4 + headerLen))
    var dataSize = 0
    while (r.hasMore) {
      val tag = r.readTag()
      if ((tag >> 3) == 3) dataSize = r.readVarint().toInt else r.skip(tag & 7)
    }
    val rest = java.util.Arrays.copyOfRange(bytes, 4 + headerLen + dataSize, bytes.length)
    val f2 = java.io.File.createTempFile("nohdr2", ".osm.pbf")
    f2.deleteOnExit()
    java.nio.file.Files.write(f2.toPath, rest)
    intercept[IllegalArgumentException] {
      OsmPbfFile.index(f2.getAbsolutePath)
    }
  }

  test("unknown blob type is rejected") {
    val f = java.io.File.createTempFile("badtype", ".osm.pbf")
    f.deleteOnExit()
    val out = new java.io.FileOutputStream(f)
    val header = new PbfWriter
    header.writeString(1, "OSMWeird")
    header.writeVarintField(3, 0)
    val hb = header.toBytes
    out.write(Array[Byte](0, 0, 0, hb.length.toByte))
    out.write(hb)
    out.close()
    val e = intercept[IllegalArgumentException] {
      OsmPbfFile.index(f.getAbsolutePath)
    }
    assert(e.getMessage.contains("OSMWeird"))
  }

  test("countTypes rejects non-length-delimited encodings loudly") {
    // an UNPACKED repeated DenseNodes.id (wire type 0 per element) is
    // legal protobuf but violates the packed assumption the counting
    // walk (and the full decoder) share — countPackedVarints would
    // misread the varint as a byte length. Hand-craft:
    // PrimitiveBlock { group(2,len) { DenseNodes(2,len) { id tag=0x08 varint } } }
    val block = Array[Byte](0x12, 0x04, 0x12, 0x02, 0x08, 0x05)
    val e = intercept[java.io.IOException] { OsmPbfFile.countTypes(block) }
    assert(e.getMessage.contains("wire type") && e.getMessage.contains("DenseNodes.id"))
  }
}
