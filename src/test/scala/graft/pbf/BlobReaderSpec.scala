package graft.pbf

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import graft.pbf.OsmPbfWriter._

/** BlobReader keeps one positioned-read stream per file (readBlob
  * opens per blob — a metadata round-trip per 8k-element block on
  * object stores); blobs must decode identically to readBlob, in any
  * order, across files, and close() must release every stream. */
class BlobReaderSpec extends AnyFunSuite {

  private def mkFile(tag: String, ids: Seq[Long]): String = {
    val f = java.io.File.createTempFile(s"blobrd$tag", ".osm.pbf")
    f.deleteOnExit()
    write(f.getAbsolutePath, ids.map(i => Seq(N(i, 1.0, 2.0))))
    f.getAbsolutePath
  }

  test("positioned reads match readBlob in any order, across files") {
    val fa = mkFile("a", Seq(1L, 2L, 3L))
    val fb = mkFile("b", Seq(10L, 11L))
    val conf = new Configuration()
    val blobs = OsmPbfFile.index(fa, conf) ++ OsmPbfFile.index(fb, conf)
    assert(blobs.size === 5)
    val want = blobs.map(b => OsmPbfFile.readBlob(b, conf).toSeq)
    val rd = new BlobReader(new Configuration())
    try {
      // interleaved + repeated + reversed access — positioned reads
      // must not depend on stream position
      val order = Seq(4, 0, 3, 1, 4, 2, 0)
      order.foreach { i =>
        assert(rd.read(blobs(i)).toSeq === want(i), s"blob $i diverged")
      }
    } finally rd.close()
    // close is idempotent and a fresh reader still works
    val rd2 = new BlobReader(new Configuration())
    assert(rd2.read(blobs.head).toSeq === want.head)
    rd2.close()
    rd2.close()
  }
}
