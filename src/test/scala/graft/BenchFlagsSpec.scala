package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 bench self-adjudication flags (VERDICT r17
  * task 1): the JIT-churn flag fires only on the r17 q22 signature
  * (headline CPU blown vs prev AND jit-dominated), the rep-growth
  * flag only on a strictly rising meaningful slope across all three
  * reps, and the requeue child's JSON line round-trips through the
  * parent's parser regex. */
class BenchFlagsSpec extends AnyFunSuite {

  private def res(reps: Seq[Bench.Rep]): Bench.QRes = {
    val ok = reps.filterNot(_.failed)
    Bench.QRes("q", if (ok.nonEmpty) ok.map(_.wall).min else -1.0,
      if (ok.nonEmpty) ok.map(_.cpu).min else -1.0,
      reps.head.load, 1L, reps)
  }
  private def rep(wall: Double, cpu: Double, jit: Double = 0.0,
      failed: Boolean = false): Bench.Rep =
    Bench.Rep(wall, cpu, 0.3, 1L, failed, gc = 0.1, jit = jit, heap = 100.0)

  test("churn: blown CPU + jit-dominated headline rep fires; either alone does not") {
    // r17 q22 shape: min-wall rep at 21.4 CPU-s (prev 3.6), 8.9 jit-s
    val q22 = res(Seq(rep(19.5, 148.0, jit = 102.0),
      rep(10.8, 40.0, jit = 14.8), rep(5.6, 21.4, jit = 8.9)))
    assert(Bench.churned(q22, prevCpu = Some(3.6)))
    // same CPU blow with NO jit share = real work (plan change) — the
    // taint rules own it, churn must not fire
    assert(!Bench.churned(res(Seq(rep(5.6, 21.4, jit = 0.5))), Some(3.6)))
    // jit-heavy but CPU within 2x prev = ordinary warmup
    assert(!Bench.churned(res(Seq(rep(2.0, 6.0, jit = 3.0))), Some(3.6)))
    // no prev CPU → cannot adjudicate, never flags
    assert(!Bench.churned(q22, prevCpu = None))
  }

  test("growth: strictly rising CPU across all reps with slope fires") {
    // r17 pipe_full_curation shape: 15→45→58 CPU-s
    val curation = res(Seq(rep(5.0, 15.0), rep(6.0, 45.0), rep(7.0, 58.0)))
    assert(Bench.repGrowth(curation))
    // non-monotone (classic warmup descent) must not fire
    assert(!Bench.repGrowth(res(Seq(rep(9.0, 90.0), rep(1.0, 8.0), rep(1.2, 8.5)))))
    // rising but under the slope floor (noise) must not fire
    assert(!Bench.repGrowth(res(Seq(rep(1.00, 8.0), rep(1.01, 8.1), rep(1.02, 8.2)))))
    // two reps cannot distinguish growth from first-rep warmup
    assert(!Bench.repGrowth(res(Seq(rep(1.0, 8.0), rep(3.0, 30.0)))))
    // a failed middle rep breaks the all-reps-rising evidence
    assert(!Bench.repGrowth(res(Seq(rep(5.0, 15.0),
      rep(-1.0, -1.0, failed = true), rep(7.0, 58.0)))))
  }

  test("requeue parser regex round-trips BenchOne's line format") {
    val line = """{"benchone":"tpch_q22_idle_rich","wall":1.104,"cpu":4.79,""" +
      """"rows":21,"reps":[[1.104,4.79,0.30,0.10,0.50,100,3,12,1]]}"""
    val pat = ("\\{\"benchone\":\"([^\"]+)\",\"wall\":(-?[0-9.]+)," +
      "\"cpu\":(-?[0-9.]+),\"rows\":(-?\\d+)").r
    val m = pat.findFirstMatchIn(line)
    assert(m.isDefined)
    assert(m.get.group(1) === "tpch_q22_idle_rich")
    assert(m.get.group(2).toDouble === 1.104)
    assert(m.get.group(3).toDouble === 4.79)
    assert(m.get.group(4).toLong === 21L)
    // the all-FAIL sentinel line parses too (wall -1.0 → never replaces)
    val fail = """{"benchone":"q","wall":-1.000,"cpu":-1.00,"rows":-1,"reps":["FAIL"]}"""
    assert(pat.findFirstMatchIn(fail).exists(_.group(2).toDouble === -1.0))
  }

  test("requeue severity sources: churn by cpu-vs-prev, growth by rep slope, over2x by wall-vs-prev") {
    def named(name: String, reps: Seq[Bench.Rep]): Bench.QRes =
      res(reps).copy(name = name)
    // churn row: min-wall rep cpu 21.4 vs prev cpu 3.6 → severity ~5.94
    val churnRow = named("churny", Seq(rep(19.5, 148.0, jit = 102.0),
      rep(10.8, 40.0, jit = 14.8), rep(5.6, 21.4, jit = 8.9)))
    // growth row: cpu slope 58/15 ≈ 3.87 dominates wall slope 7/5
    val growthRow = named("growy", Seq(rep(5.0, 15.0), rep(6.0, 45.0), rep(7.0, 58.0)))
    // over2x row: headline wall 3.0 vs prev 1.0 → severity 3.0
    val over2xRow = named("slowy", Seq(rep(3.0, 4.0), rep(3.1, 4.1), rep(3.2, 4.2)))
    // clean row: nothing fires
    val cleanRow = named("cleany", Seq(rep(1.0, 2.0), rep(0.9, 1.9), rep(0.9, 1.9)))
    val cands = Bench.requeueCandidates(
      Seq(churnRow, growthRow, over2xRow, cleanRow),
      prevWall = Map("slowy" -> 1.0, "churny" -> 20.0, "growy" -> 10.0,
        "cleany" -> 1.0),
      prevCpu = Map("churny" -> 3.6, "growy" -> 100.0, "cleany" -> 2.0))
    val bySrc = cands.groupBy(_._1)
    assert(math.abs(bySrc("churny").head._2 - 21.4 / 3.6) < 1e-9)
    assert(math.abs(bySrc("growy").head._2 - 58.0 / 15.0) < 1e-9)
    assert(math.abs(bySrc("slowy").head._2 - 3.0) < 1e-9)
    assert(!bySrc.contains("cleany"))
    // a row flagged by BOTH growth and over2x appears once per source
    // and rankRequeue takes its max — end-to-end through both functions
    val dual = named("dualy", Seq(rep(3.0, 15.0), rep(3.5, 45.0), rep(4.0, 58.0)))
    val dualCands = Bench.requeueCandidates(Seq(dual),
      prevWall = Map("dualy" -> 1.0), prevCpu = Map.empty)
    assert(dualCands.map(_._1).count(_ == "dualy") == 2)
    val (sel, drop) = Bench.rankRequeue(dualCands ++ Seq("mild" -> 2.1), max = 1)
    assert(sel == Seq("dualy") && drop == Seq("mild"))
    // missing prev entirely → a clean run yields no candidates at all
    assert(Bench.requeueCandidates(Seq(over2xRow), Map.empty, Map.empty).isEmpty)
  }

  test("no-prev rows enter the requeue pool at lowest severity (r21 task 9)") {
    def named(name: String, reps: Seq[Bench.Rep]): Bench.QRes =
      res(reps).copy(name = name)
    val newRow = named("newbie", Seq(rep(1.0, 2.0), rep(0.9, 1.9), rep(0.9, 1.9)))
    val over2xRow = named("slowy", Seq(rep(3.0, 4.0), rep(3.1, 4.1), rep(3.2, 4.2)))
    // non-empty prev lacking the new row → the row is a candidate at 1.0
    val cands = Bench.requeueCandidates(Seq(newRow, over2xRow),
      prevWall = Map("slowy" -> 1.0), prevCpu = Map.empty)
    assert(cands.contains("newbie" -> 1.0))
    // under the cap the real ≥2x flag wins the slot; the new row is the
    // named dropped candidate, readable from the artifact
    val (sel, drop) = Bench.rankRequeue(cands, max = 1)
    assert(sel === Seq("slowy") && drop === Seq("newbie"))
    // an all-FAIL new row has no valid measurement to adjudicate
    val failRow = named("deady",
      Seq(rep(-1.0, -1.0, failed = true), rep(-1.0, -1.0, failed = true),
        rep(-1.0, -1.0, failed = true)))
    assert(!Bench.requeueCandidates(Seq(failRow), Map("slowy" -> 1.0), Map.empty)
      .exists(_._1 == "deady"))
  }

  test("firstRepTotal sums first successful reps (r21 task 6)") {
    def named(name: String, reps: Seq[Bench.Rep]): Bench.QRes =
      res(reps).copy(name = name)
    val warm = named("warm", Seq(rep(5.0, 15.0), rep(1.0, 2.0), rep(1.0, 2.0)))
    val cold = named("cold", Seq(rep(-1.0, -1.0, failed = true), rep(2.0, 3.0)))
    val dead = named("dead", Seq(rep(-1.0, -1.0, failed = true)))
    // warm contributes its FIRST rep (5.0, not the min 1.0); cold falls
    // to its first SUCCESSFUL rep; an all-FAIL row keeps the -1 sentinel
    assert(math.abs(Bench.firstRepTotal(Seq(warm, cold, dead)) - (5.0 + 2.0 - 1.0)) < 1e-9)
  }
}
