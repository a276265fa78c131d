package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the bench artifact's `prev` sourcing rules (VERDICT r7 task 1):
  * the committed bench/bench_r*.json is preferred, the harness tail is
  * only trusted via the explicit `"queries":{` marker, and a truncated
  * tail whose surviving pairs are the CPU dict (the exact BENCH_r07
  * failure) yields EMPTY prev rather than CPU-seconds-as-wall. */
class BenchPrevSpec extends AnyFunSuite {

  private def write(dir: java.io.File, name: String, txt: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
    try w.print(txt) finally w.close()
  }

  test("wallBlock parses the explicit queries marker") {
    val got = Bench.wallBlock(
      """{"metric":"total","queries":{"q1_agg":1.250,"osm_buildings":4.100},"cpu":{"q1_agg":9.99}}""")
    assert(got.toMap === Map("q1_agg" -> 1.25, "osm_buildings" -> 4.1))
  }

  test("wallBlock returns empty on a marker-less truncated tail (no CPU harvest)") {
    // shape of BENCH_r07's surviving tail: wall dict truncated off, the
    // bare "name":number pairs that remain are CPU-seconds
    val tail = """0,"j2_star_broadcast":1.16,"osm_big_buildings":96.2},"load":{"osm_big_buildings":7.01}}"""
    assert(Bench.wallBlock(tail).isEmpty)
  }

  test("prevRound prefers the committed bench file over the harness tail") {
    val bench = Files.createTempDirectory("graft_bench").toFile
    val repo = Files.createTempDirectory("graft_repo").toFile
    write(bench, "bench_r7.json",
      """{"metric":"total","queries":{"q1_agg":0.500},"cpu":{"q1_agg":3.00}}""")
    write(repo, "BENCH_r07.json",
      """{"tail":"\"queries\":{\"q1_agg\":9.000}"}""")
    assert(Bench.prevRound(bench.getPath, repo.getPath) === Map("q1_agg" -> 0.5))
  }

  test("prevRound falls back to the harness file's marker when no committed file") {
    val bench = Files.createTempDirectory("graft_bench_empty").toFile
    val repo = Files.createTempDirectory("graft_repo2").toFile
    write(repo, "BENCH_r07.json",
      """{"tail":"\"queries\":{\"q1_agg\":9.000,\"w2_run_ids\":0.310}"}""")
    assert(Bench.prevRound(bench.getPath, repo.getPath) ===
      Map("q1_agg" -> 9.0, "w2_run_ids" -> 0.31))
  }

  test("prevRecord prefers the QUIETEST same-round record (VERDICT r10 task 5)") {
    val bench = Files.createTempDirectory("graft_bench_quiet").toFile
    val repo = Files.createTempDirectory("graft_repo_quiet").toFile
    // the round-close record was taken at load 7.88 (the r10 driver
    // shape); the judge probe of the SAME round ran quiet — prev must
    // cite the quiet one so deltas compare quiet-to-quiet
    write(bench, "bench_r10.json",
      """{"load_max":7.88,"queries":{"q1_agg":0.954},"cpu":{"q1_agg":9.00}}""")
    write(bench, "judge_probe_r10.json",
      """{"load_max":0.16,"queries":{"q1_agg":0.118},"cpu":{"q1_agg":1.10}}""")
    // an older quiet record must NOT shadow the newest round
    write(bench, "bench_r9.json",
      """{"load_max":0.01,"queries":{"q1_agg":0.142},"cpu":{"q1_agg":1.00}}""")
    val got = Bench.prevRecord(bench.getPath, repo.getPath)
    assert(got.wall === Map("q1_agg" -> 0.118))
    assert(got.cpu === Map("q1_agg" -> 1.1))
    assert(got.source === "judge_probe_r10.json")
  }

  test("an unstamped record loses the quiet comparison; _rerun suffixes participate") {
    val bench = Files.createTempDirectory("graft_bench_stamp").toFile
    val repo = Files.createTempDirectory("graft_repo_stamp").toFile
    write(bench, "bench_r8.json",
      """{"queries":{"q1_agg":5.000},"cpu":{"q1_agg":50.0}}""") // no load_max stamp
    write(bench, "bench_r8_rerun.json",
      """{"load_max":1.20,"queries":{"q1_agg":0.700},"cpu":{"q1_agg":6.50}}""")
    val got = Bench.prevRecord(bench.getPath, repo.getPath)
    assert(got.wall === Map("q1_agg" -> 0.7) && got.source === "bench_r8_rerun.json")
  }

  test("prevRecord excludes the current round's own earlier runs") {
    val bench = Files.createTempDirectory("graft_bench_cur").toFile
    val repo = Files.createTempDirectory("graft_repo_cur").toFile
    // an earlier (polluted, soon-overwritten) attempt of THIS round
    // must never become "prev" — prev means the previous ROUND
    write(bench, "bench_r11.json",
      """{"load_max":5.86,"queries":{"q1_agg":0.900},"cpu":{"q1_agg":9.0}}""")
    write(bench, "judge_probe_r10.json",
      """{"load_max":0.16,"queries":{"q1_agg":0.118},"cpu":{"q1_agg":1.1}}""")
    val got = Bench.prevRecord(bench.getPath, repo.getPath, currentRound = 11)
    assert(got.source === "judge_probe_r10.json")
    // without the bound (library default) the newest round still wins
    assert(Bench.prevRecord(bench.getPath, repo.getPath).source === "bench_r11.json")
  }

  test("loadMaxOf parses the stamp and defaults to MaxValue") {
    assert(Bench.loadMaxOf("""{"load_max":3.75,"x":1}""") === 3.75)
    assert(Bench.loadMaxOf("""{"load_max": -1.00}""") === -1.0)
    assert(Bench.loadMaxOf("""{"queries":{}}""") === Double.MaxValue)
  }

  test("prevRound is empty when the harness tail lost the marker (BENCH_r07 shape)") {
    val bench = Files.createTempDirectory("graft_bench_none").toFile
    val repo = Files.createTempDirectory("graft_repo3").toFile
    write(repo, "BENCH_r07.json",
      """{"tail":"0,\"osm_big_buildings\":96.2},\"load\":{\"osm_big_buildings\":7.01}}"}""")
    assert(Bench.prevRound(bench.getPath, repo.getPath).isEmpty)
  }
}
