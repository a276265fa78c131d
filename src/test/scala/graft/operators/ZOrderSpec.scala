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

  test("z-layout actually SKIPS parquet row groups on the NON-leading dim (measured)") {
    // VERDICT r12 #2: write the same table via ZOrder.layout vs random
    // placement, scan with a selective predicate on y (the dimension a
    // lexicographic sort would NOT serve), and read the scan node's
    // numOutputRows — with parquet filter pushdown, a row group whose
    // min/max excludes the predicate is never materialized, so the
    // metric counts rows of SURVIVING row groups. 64 z-files cover
    // (y9 y8 y7, x9 x8 x7) cells, so y∈[100,115] (y<128 ⇒ high y-bits
    // 000) touches only files with that y-prefix ⇒ ~12-17% read (range
    // partitioning splits by row count, not exact bit cells);
    // the random layout's every file spans all of y ⇒ 100% read.
    import spark.implicits._
    val rnd = new scala.util.Random(0x5C1F)
    val n = 100000
    val df = Seq.fill(n)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_zskip").toFile
    val zDir = new java.io.File(base, "zorder").getAbsolutePath
    val rDir = new java.io.File(base, "random").getAbsolutePath
    try {
      ZOrder.layout(df, Seq("x", "y"), 10, numFiles = 64).write.parquet(zDir)
      df.repartition(64).write.parquet(rDir) // same file count, no clustering

      def scanned(dir: String): (Long, Long) = {
        val q = spark.read.parquet(dir)
          .filter(col("y") >= 100L && col("y") <= 115L)
        // collect() executes THIS queryExecution (count() would spawn
        // its own, leaving these metrics untouched at 0)
        val result = q.collect().length.toLong
        val plan = q.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val scans = plan.collectLeaves().collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
        // the skip only exists if the predicate reached the reader
        assert(scans.forall(_.metadata("PushedFilters").contains("GreaterThanOrEqual(y,100)")),
          s"y predicate was not pushed down: ${scans.map(_.metadata("PushedFilters"))}")
        (result, scans.map(_.metrics("numOutputRows").value).sum)
      }

      val (zResult, zRead) = scanned(zDir)
      val (rResult, rRead) = scanned(rDir)
      assert(zResult === rResult, "layouts returned different query results")
      assert(rRead === n.toLong,
        s"random layout unexpectedly skipped ($rRead of $n) — test premise broken")
      // strict skip ratio: the z-layout must read at most a quarter of
      // what the random layout reads (measured: 17%)
      assert(zRead * 4 <= rRead,
        s"z-layout did not skip: read $zRead rows vs $rRead unclustered")
      info(s"z-layout read $zRead of $n rows (${100 * zRead / n}%); random read $rRead")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base)
    }
  }
}
