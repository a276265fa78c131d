package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: representative scale-path queries per operator
  * family, timed end-to-end (plan + execute + count) at
  * SPARK_GRAFT_SF_DIR. Exact O(n²) verification baselines
  * (dedup_ngram_jaccard, vec_neardup_pairs) are deliberately not
  * headline — their scalable counterparts (dedup_minhash_lsh,
  * vec_ann_lsh / vec_topk_bruteforce) are. */
object Bench {

  val headline: Seq[String] = Seq(
    // analytics headliners
    "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q5_local_supplier",
    // scan / filter / sort
    "q1_agg", "s13_scan_project", "f1_type_filter", "o3_multikey_sort",
    // joins
    "j1_ref_coord_join", "j1_skew_salted", "j2_star_broadcast", "j6_anti_join", "j7_semi_join",
    // aggregation / window
    "a1_first_last", "a6_group_chain", "w2_run_ids", "o4_dedup_first_wins",
    "r1_pivot",
    // topology
    "g10_topo_segments",
    // text pipeline
    "dedup_exact_hash", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_cluster_cc", "dedup_cluster_cc_dist",
    "text_quality", "text_langid", "text_tokens", "text_fingerprint",
    // vectors
    "vec_topk_bruteforce", "vec_ann_lsh", "vec_ann_ivf", "vec_neardup_lsh",
    // events / multimodal / integrated pipeline
    "ev_window_agg", "ev_sessionize", "ev_view_click_join", "ev_dedup_first",
    "ev_asof_join", "ev_range_join",
    "mm_features", "pipe_clean_corpus", "pipe_sample_stratified",
    "pipe_decontaminate", "text_vocab_topk",
    // osm fixture end-to-end + 2M-node scale probes
    "osm_buildings", "osm_topology",
    "osm_big_pois", "osm_big_topology", "osm_big_buildings")

  /** Extract the per-query wall dict from a JSON-ish string: the first
    * `"queries":{...}` block. Returns empty when the marker is absent —
    * deliberately NO free-regex harvest of bare "name":number pairs:
    * BENCH_r07's tail was truncated just past the wall dict, so the
    * surviving first-occurrence pairs were the CPU dict, and a regex
    * fallback would have reported CPU-seconds as "previous wall",
    * manufacturing phantom 2-10x regressions. Missing prev is honest;
    * wrong-unit prev is poison. */
  private[graft] def wallBlock(txt: String): Seq[(String, Double)] = {
    val tag = "\"queries\":{"
    val ix = txt.indexOf(tag)
    if (ix < 0) Nil
    else {
      val start = ix + tag.length
      val end0 = txt.indexOf('}', start)
      val end = if (end0 < 0) txt.length else end0
      txt.substring(start, end).split(",").toSeq.flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => scala.util.Try(
            k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble).toOption
          case _ => None
        }
      }
    }
  }

  /** Per-query wall seconds from the previous round, for the artifact's
    * `prev` block. Source preference:
    *  1. the newest committed `bench/bench_r*.json` — written whole by
    *     this main every run, so it always parses and always carries
    *     the wall dict;
    *  2. else the newest harness `BENCH_r*.json`, but ONLY via the
    *     explicit `"queries":{` marker (see [[wallBlock]] for why the
    *     old free-regex fallback is gone).
    * Empty on round 1 / outside the repo checkout. */
  private[graft] def prevRound(
      benchDir: String = "/root/repo/bench",
      repoDir: String = "/root/repo"): Map[String, Double] = {
    def read(f: java.io.File): String =
      scala.util.Using(scala.io.Source.fromFile(f))(_.mkString).getOrElse("")
    def newest(dir: String, pat: String): Option[java.io.File] =
      Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.matches(pat)).sortBy(_.getName).lastOption
    val committed = newest(benchDir, "bench_r\\d+\\.json")
      .map(f => wallBlock(read(f))).getOrElse(Nil)
    val fromHarness =
      if (committed.nonEmpty) Nil
      else newest(repoDir, "BENCH_r\\d+\\.json")
        .map(f => wallBlock(read(f).replace("\\\"", "\""))).getOrElse(Nil)
    (if (committed.nonEmpty) committed else fromHarness).toMap
  }

  /** Current round number, derived from the newest harness BENCH file
    * (BENCH_r07.json present => this run is round 8). Falls back to 0
    * outside the repo checkout. */
  private def roundNumber: Int = {
    Option(new java.io.File("/root/repo").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .sorted.lastOption.map(_ + 1).getOrElse(0)
  }

  def main(args: Array[String]): Unit = {
    // the artifact line must be valid JSON on any host JVM: a default
    // locale with ',' as decimal separator would make every f"" number
    // unparseable (ADVICE r7)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: touch every table once so the timed loop measures
    // steady-state query latency, not JVM/codegen/file-index warmup
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try graft.pbf.BigWorld.ensure(graft.queries.OsmQueries.BigPath, 2000000, 100000)
    catch { case _: Throwable => }
    val qs = SparkEntry.queries
    // process CPU-seconds alongside wall per rep: on a contended host
    // the wall clock swings 10-20x with steal while CPU-seconds of
    // actual work stay comparable (TimeQuery doctrine) — BENCH_r06
    // recorded a phantom 2.1x "regression" that was pure host noise and
    // could not be diagnosed from the artifact because only wall was
    // recorded. The system 1-min load average sampled before each query
    // is the second sentinel: a polluted run shows load >> this JVM's
    // own parallelism, making noise self-evident from the JSON alone.
    // the HotSpot-specific subinterface carries getProcessCpuTime; on a
    // JVM whose bean doesn't implement it, degrade to -1 CPU sentinels
    // rather than throwing (ADVICE r7)
    val baseBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val sunBean = baseBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def procCpuNanos(): Long = sunBean.map(_.getProcessCpuTime).getOrElse(-1L)
    def loadAvg(): Double = baseBean.getSystemLoadAverage
    final case class QRes(name: String, wall: Double, cpu: Double,
        load: Double, reps: Seq[(Double, Double)])
    // two timed reps, report the min: single-shot numbers swing ±2x
    // from GC/codegen/scheduler jitter in a 35-query sequence; the min
    // is the steady-state latency the plan actually supports. The
    // heavy per-way-walk probes JIT across the first TWO executions
    // (r7's "96 CPU-s" osm_big_buildings was min-of-2 catching the
    // warmup rep of a ~20 CPU-s steady state; isolated reps ran
    // 90 → 24 → 21 → 20), so osm_big_* get a third rep.
    val results = headline.filter(qs.contains).map { name =>
      val load0 = loadAvg()
      val nReps = if (name.startsWith("osm_big_")) 3 else 2
      val reps = (1 to nReps).map { _ =>
        val c0 = procCpuNanos()
        val t0 = System.nanoTime()
        val n = try qs(name)(spark, sfDir).count() catch { case _: Throwable => -1L }
        val c1 = procCpuNanos()
        val cpuS = if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9
        ((System.nanoTime() - t0) / 1e9, cpuS, n)
      }
      // a failed rep's fast error path must not pollute the min; if no
      // rep succeeded, emit a -1.0 sentinel so a failure can never
      // masquerade as a fast measurement in the benchmark JSON
      val ok = reps.filter(_._3 >= 0)
      val dt = if (ok.nonEmpty) ok.map(_._1).min else -1.0
      val cpu = if (ok.nonEmpty) ok.map(_._2).min else -1.0
      val rows = if (ok.nonEmpty) ok.head._3 else -1L
      System.err.println(
        f"[bench] $name%-24s $dt%8.2fs cpu=$cpu%8.2fs load=$load0%5.1f rows=$rows")
      // drop blocks a query persisted/checkpointed (cluster-cc rounds,
      // pipeline dup-id sets): lingering blocks from one query must not
      // pollute a later query's measurement in this 40-query JVM
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      QRes(name, dt, cpu, load0, reps.map(r => (r._1, r._2)))
    }
    def jmap(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qjson = jmap(results.map(r => r.name -> f"${r.wall}%.3f"))
    val cjson = jmap(results.map(r => r.name -> f"${r.cpu}%.2f"))
    val ljson = jmap(results.map(r => r.name -> f"${r.load}%.2f"))
    val rjson = jmap(results.map(r => r.name ->
      r.reps.map(p => f"[${p._1}%.3f,${p._2}%.2f]").mkString("[", ",", "]")))
    val total = results.map(_.wall).sum
    val loadMax = if (results.nonEmpty) results.map(_.load).max else -1.0
    // per-query times from the previous round's BENCH json, so a round
    // -over-round regression is visible in the artifact itself instead
    // of requiring a by-hand diff of two files
    val prevJson = prevRound().map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val loadMaxStr = f"$loadMax%.2f"
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","round":$roundNumber,"n_queries":${results.size},"load_max":$loadMaxStr,"queries":$qjson,"cpu":$cjson,"load":$ljson,"reps":$rjson,"prev":$prevJson,"sf":"$sfDir"}"""
    println(fullJson)
    // The full record also goes to a COMMITTED repo file so no future
    // round depends on the stdout window at all: bench/bench_r{N}.json
    // is the durable artifact and the preferred `prev` source.
    try {
      val dir = new java.io.File("/root/repo/bench")
      dir.mkdirs()
      val out = new java.io.File(dir, f"bench_r$roundNumber%d.json")
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(fullJson) finally w.close()
      System.err.println(s"[bench] full record written to $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARNING: could not write bench file: $e") }
    // FINAL stdout line, deliberately slim: the harness keeps only the
    // LAST 2000 chars of stdout, and r7's three-dict compact line
    // (~3.5 KB) pushed the wall dict out of the window — the driver
    // parsed cpu+load and reported `parsed: null`. Wall dict + total +
    // n_queries + load_max is ~1.3 KB at 46 queries; cpu/load/reps/prev
    // live on the full line above and in the committed file.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"load_max":$loadMaxStr,"queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
