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
  * committed record. The spec pins the child to the sf0.001 fixture
  * through the fork's env-override parameter, so it pays JVM+session
  * startup only, never sf0.1 query time. */
class BenchForkSpec extends AnyFunSuite {

  test("freshJvmMeasure forks a child that measures one query") {
    // pin the child to the cheapest fixture via the fork's env
    // override (review r18 pass 2) — the spec pays JVM+session
    // startup, never sf0.1 query time — and gate on that exact dir
    val childDir = "/root/testdata/sf0.001"
    assume(new java.io.File(childDir).isDirectory,
      s"child SF dir $childDir absent on this host")
    val (vals, detail) = Bench.freshJvmMeasure(Seq("q1_agg"),
      extraEnv = Map("SPARK_GRAFT_SF_DIR" -> childDir))
    assert(vals.contains("q1_agg"),
      s"child produced no parsable line; detail=$detail")
    val (wall, cpu, rows) = vals("q1_agg")
    assert(wall >= 0.0, s"child rep failed: wall=$wall")
    assert(rows > 0L, s"q1_agg returned no rows in the child: $rows")
    assert(cpu != 0.0) // either a real reading or the -1 sentinel
    assert(detail("q1_agg").contains("\"reps\":["))
  }
}
