package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the REAL fresh-JVM requeue path end-to-end: forks a
  * graft.BenchOne child with this JVM's own classpath/options (the
  * exact mechanism Bench.main uses at end of run), waits for its
  * per-query JSON line, and checks the parsed values. This is the
  * one test that can catch a classpath/add-opens/env regression in
  * the fork recipe — the regex/flag logic is unit-pinned in
  * BenchFlagsSpec, but a child that dies on startup would otherwise
  * only surface as a silently empty `requeued` block in the round's
  * committed record.
  *
  * Round 19 additions (VERDICT r18 task 1): the SIGKILL drill — a
  * fake child that kills ITSELF with signal 9 mid-run, proving the
  * two-phase emit commits the full record BEFORE the fork and the
  * requeue degrades to a loud `requeue_failed` marker plus whatever
  * partial lines the child flushed, never to a lost record — and the
  * child resource bounds (heap/agent-arg filtering, local[8] pin). */
class BenchForkSpec extends AnyFunSuite {

  test("freshJvmMeasure forks a child that measures one query") {
    // pin the child to the cheapest fixture via the fork's env
    // override (review r18 pass 2) — the spec pays JVM+session
    // startup, never sf0.1 query time — and gate on that exact dir
    val childDir = "/root/testdata/sf0.001"
    assume(new java.io.File(childDir).isDirectory,
      s"child SF dir $childDir absent on this host")
    val out = Bench.freshJvmMeasure(Seq("q1_agg"),
      extraEnv = Map("SPARK_GRAFT_SF_DIR" -> childDir))
    assert(out.vals.contains("q1_agg"),
      s"child produced no parsable line; detail=${out.detail} " +
        s"fail=${out.failReason}")
    val (wall, cpu, rows) = out.vals("q1_agg")
    assert(wall >= 0.0, s"child rep failed: wall=$wall")
    assert(rows > 0L, s"q1_agg returned no rows in the child: $rows")
    assert(cpu != 0.0) // either a real reading or the -1 sentinel
    assert(out.detail("q1_agg").contains("\"reps\":["))
    assert(out.failReason.isEmpty, s"clean run flagged: ${out.failReason}")
  }

  test("SIGKILLed child degrades to requeue_failed + partial output, record already committed") {
    // the r18 failure mode: the requeue died (exit 137) AFTER all
    // measurements existed and the round record was lost because it
    // was only emitted after the fork. Drive the REAL twoPhaseEmit +
    // freshJvmMeasure path with a child that SIGKILLs itself and
    // assert (a) phase 1's record is committed BEFORE the fork runs,
    // (b) the kill surfaces as a failReason instead of an exception,
    // (c) the line the child flushed pre-kill is kept.
    val events = scala.collection.mutable.ListBuffer.empty[String]
    val outcome = Bench.twoPhaseEmit(
      Seq("fake_row"),
      emitPhase1 = () => events += "phase1-committed",
      fork = names => {
        events += "fork"
        Bench.freshJvmMeasure(names, mainClass = "graft.BenchOneKillSelf")
      },
      emitPhase2 = o => events += s"phase2:failed=${o.failReason.isDefined}")
    assert(events.toList ==
      List("phase1-committed", "fork", "phase2:failed=true"),
      s"emit ordering broken: $events")
    assert(outcome.failReason.isDefined, "SIGKILL must surface a reason")
    assert(outcome.failReason.get.contains("137"),
      s"reason should name the kill exit: ${outcome.failReason}")
    // the line flushed before the kill is a real measurement — kept
    assert(outcome.vals.get("fake_row").contains((0.123, 0.10, 7L)),
      s"partial child output lost: ${outcome.vals}")
  }

  test("clean exit with an all-FAIL sentinel row is flagged, not read as adjudicated") {
    // review r19: a row whose every child rep threw comes back as a
    // well-formed wall=-1 line and exit 0 — no adjudicating
    // measurement exists, so the committed record must say so
    val out = Bench.freshJvmMeasure(Seq("fake_row"),
      mainClass = "graft.BenchOneAllFail")
    assert(out.failReason.isDefined, "all-FAIL sentinel must flag")
    assert(out.failReason.get.contains("fake_row"))
  }

  test("clean exit with only a wrongly-named row is flagged (count cannot mask a dropped name)") {
    val out = Bench.freshJvmMeasure(Seq("fake_row"),
      mainClass = "graft.BenchOneWrongName")
    assert(out.failReason.isDefined,
      s"missing requested name must flag even at matching row count: $out")
    assert(out.failReason.get.contains("fake_row"))
  }

  test("twoPhaseEmit with no requeue names never forks") {
    var forked = false
    Bench.twoPhaseEmit(Nil, () => (),
      _ => { forked = true; Bench.RequeueOutcome.empty }, _ => ())
    assert(!forked)
  }

  test("child JVM args drop heap pins, pre-touch and agent/port-binding args") {
    val parent = Seq(
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "-Xms8g", "-Xmx8g", "-XX:+AlwaysPreTouch",
      "-agentlib:jdwp=transport=dt_socket,address=5005",
      "-javaagent:/tmp/profiler.jar",
      "-agentpath:/tmp/native.so",
      "-Dcom.sun.management.jmxremote.port=9999",
      "-XX:StartFlightRecording=filename=/tmp/r.jfr",
      "-XX:FlightRecorderOptions=repository=/tmp",
      "-Dspark.ui.enabled=false")
    val child = Bench.childJvmArgs(parent, "4g")
    // kept: add-opens + harmless -D props
    assert(child.contains("--add-opens"))
    assert(child.contains("-Dspark.ui.enabled=false"))
    // dropped: every fixed-resource / heap arg
    for (bad <- Seq("-Xms8g", "-Xmx8g", "-XX:+AlwaysPreTouch"))
      assert(!child.contains(bad), s"$bad must be dropped")
    assert(!child.exists(_.startsWith("-agentlib")), "jdwp port binding")
    assert(!child.exists(_.startsWith("-javaagent")))
    assert(!child.exists(_.startsWith("-agentpath")))
    assert(!child.exists(_.startsWith("-Dcom.sun.management.jmxremote")))
    assert(!child.exists(_.startsWith("-XX:StartFlightRecording")))
    assert(!child.exists(_.startsWith("-XX:FlightRecorderOptions")))
    // re-bounded heap is the LAST arg (wins over any survivor)
    assert(child.last == "-Xmx4g")
  }

  test("requeue child session is pinned to the bounded thread count") {
    // BenchRig.buildSession reads SPARK_GRAFT_CPUS; freshJvmMeasure
    // sets it to requeueChildCpus before the caller's overrides. The
    // default bound must stay single-digit-ish: the child runs NEXT
    // TO the parent's local[32] session.
    assert(Bench.requeueChildCpus.toInt <= 16)
    assert(Bench.requeueChildHeap.matches("\\d+[gGmM]"))
  }
}
