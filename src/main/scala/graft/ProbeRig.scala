package graft

/** Shared scaffolding for standalone probe mains (review r19: the
  * ambient-load gate and the bench/ artifact writer were approaching a
  * fifth verbatim copy):
  *  - [[loadGate]] — the ScaleProbe quiet-host rule: refuse to start
  *    while the 1-min load exceeds SPARK_GRAFT_SCALE_MAX_LOAD (default
  *    2.0) or the 5-min load exceeds twice it (the 1-min figure alone
  *    once admitted a run that burned 2× CPU one minute after a
  *    stress kill), waiting up to 300 s; returns the start load and a
  *    `tainted` stamp if the host never quieted;
  *  - [[writeArtifact]] — the committed bench/<name> writer with the
  *    standard warn-don't-fail error path.
  * The pre-r19 probes (ScaleProbe, VecScaleProbe, AnnBatchProbe,
  * SimhashCapProbe) predate this helper and keep their inline copies;
  * new probes must use it. */
private[graft] object ProbeRig {

  def loads(): (Double, Double) =
    try {
      val parts = scala.util.Using(scala.io.Source.fromFile("/proc/loadavg"))(
        _.mkString).getOrElse("9 9").trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble)
    } catch { case _: Exception => (-1.0, -1.0) }

  /** Block until the host is quiet (bounded), then return
    * (loadAtStart, stillNoisy). */
  def loadGate(maxWaitS: Int = 300): (Double, Boolean) = {
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_LOAD", "2.0").toDouble
    def noisy(l: (Double, Double)): Boolean =
      l._1 > maxLoad || l._2 > 2 * maxLoad
    val t0 = System.nanoTime()
    while (noisy(loads()) && (System.nanoTime() - t0) / 1e9 < maxWaitS)
      Thread.sleep(5000)
    (loads()._1, noisy(loads()))
  }

  /** Write `json` to /root/repo/bench/<fileName>; warn on stderr, never
    * fail the probe, on IO errors (`tag` prefixes the log lines). */
  def writeArtifact(fileName: String, json: String, tag: String): Unit =
    try {
      val dir = new java.io.File("/root/repo/bench")
      dir.mkdirs()
      val f = new java.io.File(dir, fileName)
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(json) finally w.close()
      System.err.println(s"[$tag] written to $f")
    } catch { case e: Throwable =>
      System.err.println(s"[$tag] WARNING: could not write artifact: $e") }
}
