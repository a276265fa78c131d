package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the on-disk index-artifact tier (VERDICT r21 task 1): with
  * `spark.graft.index.dir` set, the IVF inverted-list / code tables are
  * written ONCE as cid-partitioned parquet, served by PRUNED reads
  * (PartitionFilters on cid), results identical to the session-memo
  * path, no pinned corpus replica in executor memory; eviction deletes
  * the artifact and a changed source corpus keys a rebuild. */
class IndexArtifactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Temp corpus: a copy of the sf0.001 embeddings so staleness can be
    * exercised by touching the SOURCE without mutating testdata. */
  private def copyCorpus(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_corpus").toFile
    val src = new java.io.File(sf, "embeddings.parquet")
    def cp(from: java.io.File, to: java.io.File): Unit =
      if (from.isDirectory) {
        to.mkdirs()
        Option(from.listFiles()).getOrElse(Array.empty)
          .foreach(f => cp(f, new java.io.File(to, f.getName)))
      } else java.nio.file.Files.copy(from.toPath, to.toPath)
    cp(src, new java.io.File(dir, "embeddings.parquet"))
    dir
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  test("build → pruned read → evict → staleness, results memo-identical") {
    val corpus = copyCorpus()
    val root = java.nio.file.Files.createTempDirectory("graft_idx_root").toFile
    val q = graft.SparkEntry.queries("vec_ann_ivf_trained")
    try {
      // memo-path truth first (conf unset)
      VectorOps.evictIndexTables(spark, corpus.getPath)
      val memoRows = q(spark, corpus.getPath).collect().toSeq
      VectorOps.evictIndexTables(spark, corpus.getPath)
      graft.operators.Checkpoints.unpersistUnpinned(spark)

      spark.conf.set(VectorOps.IndexDirConf, root.getPath)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet

      // BUILD: first call writes the cid-partitioned artifact
      val df1 = q(spark, corpus.getPath)
      assert(df1.collect().toSeq === memoRows,
        "artifact-served results must equal memo-served results")
      val assignedDirs = Option(root.listFiles()).getOrElse(Array.empty)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.startsWith("assigned_"))
      assert(assignedDirs.nonEmpty, s"no assigned artifact under $root")
      val fpDir = assignedDirs.head.listFiles().filter(_.isDirectory).head
      assert(fpDir.listFiles().exists(_.getName.startsWith("cid=")),
        "artifact must be cid-partitioned parquet")
      val ddl = new java.io.File(fpDir, "_graft_schema_ddl")
      assert(ddl.exists(), "schema sidecar / success marker missing")
      val builtAt = ddl.lastModified()

      // PRUNED READ: the plan scans the artifact with PartitionFilters
      // on cid (the probe-list set is a plan-time literal)
      val plan = df1.queryExecution.executedPlan.toString
      assert(plan.contains(root.getName) || plan.contains(root.getPath),
        "plan must scan the on-disk artifact")
      assert(plan.contains("PartitionFilters") && plan.contains("cid"),
        s"artifact scan must carry cid PartitionFilters; plan:\n${plan.take(2000)}")

      // NO pinned corpus replica: the artifact path must not have
      // registered new persisted RDD blocks
      val persistedAfter = spark.sparkContext.getPersistentRDDs.keySet
      assert((persistedAfter -- persistedBefore).isEmpty,
        "artifact mode must not pin executor-memory checkpoints")

      // READ: a second call serves the SAME artifact (no rewrite)
      assert(q(spark, corpus.getPath).collect().toSeq === memoRows)
      assert(ddl.lastModified() === builtAt, "second call rewrote the artifact")

      // EVICT: deletes the artifact; the next call rebuilds
      VectorOps.evictIndexTables(spark, corpus.getPath)
      assert(!fpDir.exists(), "evict must delete the on-disk artifact")
      assert(q(spark, corpus.getPath).collect().toSeq === memoRows)

      // STALENESS: a changed source corpus keys a fresh fingerprint;
      // the stale sibling dir is removed at build
      val before = assignedDirs.head.listFiles().filter(_.isDirectory).map(_.getName).toSet
      val embFile = new java.io.File(corpus, "embeddings.parquet")
      def bump(f: java.io.File): Unit = {
        f.setLastModified(f.lastModified() + 60000)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(bump)
      }
      bump(embFile)
      assert(q(spark, corpus.getPath).collect().toSeq === memoRows)
      val after = assignedDirs.head.listFiles().filter(_.isDirectory).map(_.getName).toSet
      assert(after.nonEmpty && (after intersect before).isEmpty,
        s"stale artifact sibling must be replaced: before=$before after=$after")
    } finally {
      spark.conf.unset(VectorOps.IndexDirConf)
      VectorOps.evictIndexTables(spark, corpus.getPath)
      VectorOps.evictModels(spark, corpus.getPath)
      rm(root); rm(corpus)
    }
  }

  test("every memoIndexTable tag serves artifact-mode results memo-identically") {
    // covers the remaining artifact tags (PQ codes, residual-PQ codes,
    // IVF-PQ codes, SQ8 decoded corpus) on the real sf0.001 corpus
    val root = java.nio.file.Files.createTempDirectory("graft_idx_root2").toFile
    val names = Seq("vec_ann_pq", "vec_ann_ivfpq", "vec_ann_ivfpq_res",
      "vec_ann_sq8", "vec_ann_ivfsq8")
    try {
      VectorOps.evictIndexTables(spark, sf)
      val memoRows = names.map(n =>
        n -> graft.SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap
      VectorOps.evictIndexTables(spark, sf)
      graft.operators.Checkpoints.unpersistUnpinned(spark)
      spark.conf.set(VectorOps.IndexDirConf, root.getPath)
      names.foreach { n =>
        assert(graft.SparkEntry.queries(n)(spark, sf).collect().toSeq === memoRows(n),
          s"$n drifted in artifact mode")
      }
      val tags = Option(new java.io.File(root, root.listFiles().head.getName)
        .listFiles()).getOrElse(Array.empty).map(_.getName).toSet
      Seq("pqcodes", "ivfpqcodes", "ivfpqrescodes", "sq8dec", "assigned").foreach(t =>
        assert(tags.exists(_.startsWith(t)), s"no $t artifact written; got $tags"))
    } finally {
      spark.conf.unset(VectorOps.IndexDirConf)
      VectorOps.evictIndexTables(spark, sf)
      rm(root)
    }
  }
}
