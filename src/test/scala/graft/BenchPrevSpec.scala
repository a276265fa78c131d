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

  test("prevRound is empty when the harness tail lost the marker (BENCH_r07 shape)") {
    val bench = Files.createTempDirectory("graft_bench_none").toFile
    val repo = Files.createTempDirectory("graft_repo3").toFile
    write(repo, "BENCH_r07.json",
      """{"tail":"0,\"osm_big_buildings\":96.2},\"load\":{\"osm_big_buildings\":7.01}}"}""")
    assert(Bench.prevRound(bench.getPath, repo.getPath).isEmpty)
  }
}
