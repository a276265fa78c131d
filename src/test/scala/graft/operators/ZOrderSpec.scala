package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("key == brute-force bit interleave on random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x20DD)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.key(Seq("x", "y"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === morton(x, y, 16), s"interleave wrong for ($x, $y)")
    }
  }

  test("layout() writes z-sorted partitions and drops the key column") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x1A)
    val df = Seq.fill(2000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y")
    val out = ZOrder.layout(df, Seq("x", "y"), 8, numFiles = 4)
    assert(out.columns.toSeq === Seq("x", "y"), "layout leaked its key column")
    assert(out.rdd.getNumPartitions === 4)
    // rows within each partition (and across partition ids) must be in
    // global z order — the property the writer's min/max stats rely on
    val perPart = out.withColumn("z", ZOrder.key(Seq("x", "y"), 8))
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Long]("z")))
    perPart.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.map(_._2)
      assert(seq.zip(seq.tail).forall { case (a, b) => a <= b },
        "rows not z-sorted within a partition")
    }
    val bounds = perPart.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pid, rows) => (pid, rows.map(_._2).min, rows.map(_._2).max) }
    assert(bounds.zip(bounds.tail).forall { case ((_, _, mx), (_, mn, _)) => mx <= mn },
      s"partition z-ranges overlap: $bounds")
  }

  test("z-ordered ranges are compact in BOTH dimensions (the layout point)") {
    import spark.implicits._
    // a 64x64 grid in z-order, cut into 64 equal files: each file's
    // min/max box must be a 8x8 cell in BOTH dims — a lexicographic
    // sort gives 64x1 stripes (max spread in y for a given x range)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val z = grid.map { case (x, y) => (x, y, morton(x, y, 6)) }.sortBy(_._3)
    val spreads = z.grouped(64).map { file =>
      val xs = file.map(_._1); val ys = file.map(_._2)
      (xs.max - xs.min, ys.max - ys.min)
    }.toSeq
    assert(spreads.forall { case (sx, sy) => sx <= 7 && sy <= 7 },
      s"a z-order file spans more than an 8x8 cell: $spreads")
  }
}
