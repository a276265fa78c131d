package graft.pbf

import org.scalatest.funsuite.AnyFunSuite

class VarintSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("varint round-trip (boundaries + random)") {
    val cases = Seq(0L, 1L, 127L, 128L, 300L, Int.MaxValue.toLong,
      1L << 35, Long.MaxValue, -1L, Long.MinValue) ++
      (1 to 500).map(_ => rnd.nextLong())
    cases.foreach { v =>
      val w = new PbfWriter; w.writeVarint(v)
      assert(new PbfReader(w.toBytes).readVarint() === v, s"varint $v")
    }
  }

  test("zigzag round-trip") {
    val cases = Seq(0L, -1L, 1L, -2L, 2L, Int.MinValue.toLong,
      Int.MaxValue.toLong, Long.MaxValue, Long.MinValue + 1)
    cases.foreach { v =>
      val w = new PbfWriter; w.writeZigzag(v)
      assert(new PbfReader(w.toBytes).readZigzag() === v, s"zigzag $v")
    }
  }

  test("packed longs with zigzag+delta round-trip") {
    (0 to 100).foreach { n =>
      val vs = Seq.fill(n)(rnd.nextLong() % 1000000L)
      val w = new PbfWriter
      w.writePackedLongs(1, vs, zigzag = true, delta = true)
      val r = new PbfReader(w.toBytes)
      val tag = r.readTag()
      assert((tag >> 3) === 1)
      assert(r.readPackedLongs(zigzag = true, delta = true).toSeq === vs)
    }
  }

  test("skip over all wire types") {
    val w = new PbfWriter
    w.writeVarintField(1, 42)
    w.writeTag(2, 1); (1 to 8).foreach(_ => w.writeVarint(0).toBytes) // not 8 bytes; build manually below
    // build a clean message instead:
    val m = new PbfWriter
    m.writeVarintField(1, 42)
    m.writeString(2, "skipme")
    m.writeVarintField(3, 7)
    val r = new PbfReader(m.toBytes)
    var got7 = false
    while (r.hasMore) {
      val tag = r.readTag()
      if ((tag >> 3) == 3) got7 = r.readVarint() == 7L else r.skip(tag & 7)
    }
    assert(got7)
  }
}

class OsmPbfRoundTripSpec extends AnyFunSuite {
  import OsmPbfWriter._

  private def roundTrip(blocks: Seq[Seq[Elem]], dense: Boolean = true): Seq[Decoded] = {
    val f = java.io.File.createTempFile("rtpbf", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, blocks, denseNodes = dense)
    val blobs = OsmPbfFile.index(f.getAbsolutePath)
    blobs.flatMap { b =>
      BlockDecoder.decode(
        OsmPbfFile.readBlob(b, new org.apache.hadoop.conf.Configuration()),
        Array(true, true, true), DecodeNeeds.all).toSeq
    }
  }

  test("dense nodes: ids, coords, tags, info round-trip") {
    val nodes = Seq(
      N(1, 43.51, 5.41, Seq("amenity" -> "cafe"), Some(Info(3, 1600000000L, 77))),
      N(5, 43.52, 5.42),
      N(9, -10.0, -120.5, Seq("amenity" -> "bench", "area" -> "yes")))
    val got = roundTrip(Seq(nodes))
    assert(got.map(_.id) === Seq(1L, 5L, 9L))
    assert(got.forall(_.etype == 0))
    assert(math.abs(got(0).lat - 43.51) < 1e-6 && math.abs(got(0).lon - 5.41) < 1e-6)
    assert(math.abs(got(2).lat + 10.0) < 1e-6 && math.abs(got(2).lon + 120.5) < 1e-6)
    assert(got(0).tagKeys.toSeq === Seq("amenity") && got(0).tagVals.toSeq === Seq("cafe"))
    assert(got(1).tagKeys.isEmpty)
    assert(got(2).tagKeys.toSeq === Seq("amenity", "area"))
    assert(got(0).version === 3 && got(0).timestampMs === 1600000000000L && got(0).changeset === 77L)
  }

  test("scalar (non-dense) node path matches dense semantics") {
    val nodes = Seq(N(2, 1.5, 2.5, Seq("k" -> "v")), N(4, -1.5, -2.5))
    val d = roundTrip(Seq(nodes), dense = true)
    val s = roundTrip(Seq(nodes), dense = false)
    assert(d.map(x => (x.id, x.lat, x.lon, x.tagKeys.toSeq, x.tagVals.toSeq)) ===
      s.map(x => (x.id, x.lat, x.lon, x.tagKeys.toSeq, x.tagVals.toSeq)))
  }

  test("ways: delta refs + tags round-trip") {
    val ways = Seq(
      W(100, Seq(1L, 5L, 9L, 1L), Seq("building" -> "yes")),
      W(101, Seq(9L, 5L), Seq("highway" -> "residential")))
    val got = roundTrip(Seq(ways))
    assert(got.map(_.id) === Seq(100L, 101L))
    assert(got.forall(_.etype == 1))
    assert(got(0).refs.toSeq === Seq(1L, 5L, 9L, 1L))
    assert(got(1).refs.toSeq === Seq(9L, 5L))
    assert(got(0).tagKeys.toSeq === Seq("building"))
  }

  test("relations: members round-trip") {
    val rels = Seq(R(500,
      Seq(("outer", 100L, 1.toByte), ("inner", 101L, 1.toByte), ("", 1L, 0.toByte)),
      Seq("type" -> "multipolygon")))
    val got = roundTrip(Seq(rels))
    assert(got.head.id === 500L && got.head.etype === 2)
    assert(got.head.memberRoles.toSeq === Seq("outer", "inner", ""))
    assert(got.head.memberRefs.toSeq === Seq(100L, 101L, 1L))
    assert(got.head.memberTypes.toSeq === Seq(1.toByte, 1.toByte, 0.toByte))
    assert(got.head.tagKeys.toSeq === Seq("type"))
  }

  test("raw/zlib/lz4/zstd blob codecs round-trip identically") {
    val blocks = Seq(Seq(
      N(1, 43.51, 5.41, Seq("amenity" -> "cafe")),
      N(2, 43.52, 5.42)),
      Seq(W(10, Seq(1L, 2L), Seq("highway" -> "path"))))
    val conf = new org.apache.hadoop.conf.Configuration()
    val byCodec = Seq("raw", "zlib", "lz4", "zstd").map { codec =>
      val f = java.io.File.createTempFile(s"codec-$codec", ".osm.pbf")
      f.deleteOnExit()
      write(f.getAbsolutePath, blocks, codec = codec)
      val decoded = OsmPbfFile.index(f.getAbsolutePath).flatMap { b =>
        BlockDecoder.decode(OsmPbfFile.readBlob(b, conf),
          Array(true, true, true), DecodeNeeds.all).toSeq
      }
      codec -> decoded.map(d => (d.id, d.etype, d.lat, d.lon,
        d.tagKeys.toSeq, d.tagVals.toSeq, d.refs.toSeq))
    }
    val expected = byCodec.head._2
    assert(expected.map(_._1) === Seq(1L, 2L, 10L))
    byCodec.tail.foreach { case (codec, got) =>
      assert(got === expected, s"codec $codec differs from raw")
    }
  }

  test("multi-block file + type pushdown skips groups") {
    val blocks = Seq(
      Seq(N(1, 0.0, 0.0), N(2, 1.0, 1.0)),
      Seq(W(10, Seq(1L, 2L))),
      Seq(R(20, Seq(("outer", 10L, 1.toByte)))))
    val f = java.io.File.createTempFile("mbpbf", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, blocks)
    val blobs = OsmPbfFile.index(f.getAbsolutePath)
    assert(blobs.size === 3)
    val conf = new org.apache.hadoop.conf.Configuration()
    val waysOnly = blobs.flatMap(b => BlockDecoder.decode(
      OsmPbfFile.readBlob(b, conf), Array(false, true, false), DecodeNeeds.all).toSeq)
    assert(waysOnly.map(_.id) === Seq(10L))
  }

  test("projection pushdown: tags/refs not decoded when not needed") {
    val got = roundTrip(Seq(Seq(W(7, Seq(1L, 2L, 3L), Seq("k" -> "v")))))
      .head
    assert(got.refs.nonEmpty)
    val f = java.io.File.createTempFile("pppbf", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, Seq(Seq(W(7, Seq(1L, 2L, 3L), Seq("k" -> "v")))))
    val b = OsmPbfFile.index(f.getAbsolutePath).head
    val pruned = BlockDecoder.decode(
      OsmPbfFile.readBlob(b, new org.apache.hadoop.conf.Configuration()),
      Array(true, true, true),
      DecodeNeeds(tags = false, refs = false, members = false, info = false, coords = false))
      .toSeq.head
    assert(pruned.id === 7L && pruned.tagKeys.isEmpty && pruned.refs.isEmpty)
  }

  test("property: countTypes matches the full decoder on random blocks") {
    // the count pushdown never decodes an element — its only ground
    // truth is agreement with the real decoder over arbitrary block
    // shapes (mixed groups, empty tag sets, optional info, 0-element
    // blocks, dense and plain encodings)
    val rnd = new scala.util.Random(4242)
    (1 to 40).foreach { trial =>
      val dense = rnd.nextBoolean()
      val blocks = Seq.fill(1 + rnd.nextInt(3)) {
        Seq.fill(rnd.nextInt(12)) {
          rnd.nextInt(3) match {
            case 0 => N(rnd.nextInt(100000).toLong, rnd.nextDouble() * 80,
              rnd.nextDouble() * 170,
              if (rnd.nextBoolean()) Seq("k" -> "v") else Nil,
              if (rnd.nextBoolean()) Some(Info(1, 1600000000L, 9)) else None)
            case 1 => W(rnd.nextInt(100000).toLong,
              Seq.fill(2 + rnd.nextInt(5))(rnd.nextInt(1000).toLong),
              if (rnd.nextBoolean()) Seq("highway" -> "x") else Nil)
            case _ => R(rnd.nextInt(100000).toLong,
              Seq.fill(1 + rnd.nextInt(3))(("outer", rnd.nextInt(1000).toLong, 1.toByte)),
              if (rnd.nextBoolean()) Seq("type" -> "multipolygon") else Nil)
          }
        }
      }
      val f = java.io.File.createTempFile(s"ctprop$trial", ".osm.pbf")
      f.deleteOnExit()
      write(f.getAbsolutePath, blocks, denseNodes = dense)
      val conf = new org.apache.hadoop.conf.Configuration()
      OsmPbfFile.index(f.getAbsolutePath).foreach { b =>
        val block = OsmPbfFile.readBlob(b, conf)
        val decoded = BlockDecoder.decode(block, Array(true, true, true), DecodeNeeds.all).toSeq
        val want = (
          decoded.count(_.etype == 0).toLong,
          decoded.count(_.etype == 1).toLong,
          decoded.count(_.etype == 2).toLong)
        assert(OsmPbfFile.countTypes(block) === want,
          s"trial $trial dense=$dense blocks=${blocks.map(_.size)}")
      }
    }
  }
}
