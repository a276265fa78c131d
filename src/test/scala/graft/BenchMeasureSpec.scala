package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins Bench's failure accounting (VERDICT r9 task 4): a rep that
  * errors writes an explicit "FAIL" marker into the reps array, so the
  * -1.0 headline sentinel and the reps array can never contradict each
  * other the way BENCH_r08's did (sentinel wall alongside
  * ordinary-looking rep pairs). Also pins the numeric newest-round
  * sort that keeps `prev` correct past round 9. */
class BenchMeasureSpec extends AnyFunSuite {

  private val noLoad = () => 1.5
  private val noCpu = () => -1L

  test("all reps failing yields the -1.0 sentinel and all-FAIL markers") {
    val r = Bench.measure("boom", 3, noLoad, noCpu,
      () => throw new RuntimeException("deliberate bench failure"))
    assert(r.wall === -1.0 && r.cpu === -1.0 && r.rows === -1L)
    assert(r.reps.size === 3 && r.reps.forall(_.failed))
    assert(Bench.repsJson(r.reps) === "[\"FAIL\",\"FAIL\",\"FAIL\"]")
  }

  test("a single failed rep is excluded from the min but marked in the artifact") {
    var call = 0
    val r = Bench.measure("flaky", 3, noLoad, noCpu, () => {
      call += 1
      if (call == 2) throw new RuntimeException("deliberate bench failure")
      42L
    })
    assert(r.wall >= 0.0 && r.rows === 42L)
    assert(r.reps.map(_.failed) === Seq(false, true, false))
    val json = Bench.repsJson(r.reps)
    // middle entry is the FAIL marker; outer entries are [wall,cpu,load]
    assert(json.split(",\"FAIL\",").length === 2, json)
    assert(json.contains("1.50"), s"per-rep load missing from $json")
  }

  test("sentinel iff all reps failed (no partial-failure sentinel)") {
    val ok = Bench.measure("fine", 2, noLoad, noCpu, () => 7L)
    assert(ok.wall >= 0.0 && ok.reps.forall(!_.failed))
    assert(!Bench.repsJson(ok.reps).contains("FAIL"))
  }

  private def res(reps: Seq[Bench.Rep]): Bench.QRes = {
    val ok = reps.filterNot(_.failed)
    Bench.QRes("q", if (ok.nonEmpty) ok.map(_.wall).min else -1.0,
      if (ok.nonEmpty) ok.map(_.cpu).min else -1.0,
      reps.head.load, 1L, reps)
  }

  test("taint predicate: judged on the MIN-WALL rep, not the first or worst") {
    // rep2 is the min-wall rep and ran quiet → NOT tainted, even
    // though rep1 started under heavy load
    val quiet = res(Seq(
      Bench.Rep(9.0, 90.0, 7.9, 1L, failed = false),
      Bench.Rep(1.0, 8.0, 0.3, 1L, failed = false),
      Bench.Rep(1.2, 8.5, 0.4, 1L, failed = false)))
    assert(!Bench.taintedRes(quiet, prevCpu = Some(8.0)))
    // min-wall rep itself started above the load threshold → tainted
    val loaded = res(Seq(Bench.Rep(1.0, 8.0, 7.9, 1L, failed = false)))
    assert(Bench.taintedRes(loaded, prevCpu = None))
    // the HEADLINE (min-wall) rep's CPU is 3x the committed prev CPU
    // and an outlier against the row's own best CPU → tainted (the
    // BENCH_r10 phantom-regression signature: the jump is confined to
    // the rep the headline number comes from)
    val cpuBlown = res(Seq(
      Bench.Rep(4.0, 96.0, 2.5, 1L, failed = false),
      Bench.Rep(5.0, 20.0, 2.6, 1L, failed = false)))
    assert(Bench.taintedRes(cpuBlown, prevCpu = Some(20.0)))
    assert(!Bench.taintedRes(cpuBlown, prevCpu = Some(50.0)))
    assert(!Bench.taintedRes(cpuBlown, prevCpu = None)) // round 1: no prior
    // a single-rep row cannot demonstrate stability → CPU rule applies
    val oneShot = res(Seq(Bench.Rep(13.9, 96.0, 2.5, 1L, failed = false)))
    assert(Bench.taintedRes(oneShot, prevCpu = Some(20.0)))
    // the same CPU jump REPRODUCING across reps is a plan change, not
    // contention (r12: DistributedRank rows stamped at load 0.3-3.8)
    val cpuStable = res(Seq(
      Bench.Rep(13.9, 96.0, 2.5, 1L, failed = false),
      Bench.Rep(14.2, 99.0, 0.4, 1L, failed = false),
      Bench.Rep(14.0, 97.5, 0.3, 1L, failed = false)))
    assert(!Bench.taintedRes(cpuStable, prevCpu = Some(20.0)))
    // ...but the SAME stable CPU blow with EVERY rep at elevated
    // (>2.0) load is sustained sub-threshold co-tenancy → tainted
    // (ADVICE r12: steady contention below load 4.0 that inflates CPU
    // consistently must not evade the guard)
    val sustained = res(Seq(
      Bench.Rep(13.9, 96.0, 2.5, 1L, failed = false),
      Bench.Rep(14.2, 99.0, 3.1, 1L, failed = false),
      Bench.Rep(14.0, 97.5, 2.8, 1L, failed = false)))
    assert(Bench.taintedRes(sustained, prevCpu = Some(20.0)))
    // sustained elevated load WITHOUT a CPU blow stays untainted
    assert(!Bench.taintedRes(sustained, prevCpu = Some(50.0)))
    // an all-FAIL row is a FAIL, not a taint
    val allFail = res(Seq(Bench.Rep(0.1, 0.1, 9.9, -1L, failed = true)))
    assert(!Bench.taintedRes(allFail, prevCpu = Some(1.0)))
  }

  test("first-rep blowup flag: successful first rep > 5x min wall, FAIL not double-flagged") {
    // first rep 10x the min → flagged (the BENCH_r16 71 s signature)
    val blown = res(Seq(
      Bench.Rep(10.0, 10.0, 0.3, 1L, failed = false),
      Bench.Rep(1.0, 1.0, 0.3, 1L, failed = false),
      Bench.Rep(1.1, 1.1, 0.3, 1L, failed = false)))
    assert(Bench.firstRepBlown(blown))
    // ordinary warmup (< 5x) stays unflagged
    val warm = res(Seq(
      Bench.Rep(3.0, 3.0, 0.3, 1L, failed = false),
      Bench.Rep(1.0, 1.0, 0.3, 1L, failed = false)))
    assert(!Bench.firstRepBlown(warm))
    // a FAILED first rep is already loud via the "FAIL" marker
    val failedFirst = res(Seq(
      Bench.Rep(10.0, 10.0, 0.3, -1L, failed = true),
      Bench.Rep(1.0, 1.0, 0.3, 1L, failed = false)))
    assert(!Bench.firstRepBlown(failedFirst))
    // an all-FAIL row has no min to compare against
    val allFail = res(Seq(Bench.Rep(0.1, 0.1, 0.3, -1L, failed = true)))
    assert(!Bench.firstRepBlown(allFail))
  }

  test("per-rep telemetry lands in the artifact entry (gc/jit/heap tail)") {
    val r = Bench.Rep(1.0, 2.0, 0.5, 1L, failed = false,
      gc = 0.25, jit = 1.5, heap = 512.0)
    assert(Bench.repsJson(Seq(r)) === "[[1.000,2.00,0.50,0.25,1.50,512]]")
    // default sentinels when the beans are absent
    val s = Bench.Rep(1.0, 2.0, 0.5, 1L, failed = false)
    assert(Bench.repsJson(Seq(s)) === "[[1.000,2.00,0.50,-1.00,-1.00,-1]]")
  }

  test("prevRound picks bench_r10 over bench_r9 (numeric, not name, sort)") {
    val bench = Files.createTempDirectory("graft_bench_num").toFile
    val repo = Files.createTempDirectory("graft_repo_num").toFile
    def write(name: String, txt: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(bench, name), "UTF-8")
      try w.print(txt) finally w.close()
    }
    write("bench_r9.json", """{"queries":{"q1_agg":9.000}}""")
    write("bench_r10.json", """{"queries":{"q1_agg":10.000}}""")
    // the re-run record must not shadow the round-close record
    write("bench_r8_rerun.json", """{"queries":{"q1_agg":8.000}}""")
    assert(Bench.prevRound(bench.getPath, repo.getPath) === Map("q1_agg" -> 10.0))
  }
}
