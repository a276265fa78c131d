package graft

import org.scalatest.funsuite.AnyFunSuite

/** The micro record line is the contract between Bench stdout and the
  * harness's 2000-char tail window: it must be ONE complete JSON
  * object, size-bounded REGARDLESS of inputs (query count, tainted
  * population, requeue failure reason length/content), because the
  * slim line's per-query wall dict outgrew the window at ~75 queries
  * and silently nulled the driver's parsed record from round 15 on. */
class BenchMicroSpec extends AnyFunSuite {

  private def parseable(s: String): Boolean = {
    // minimal structural check without a JSON lib: one object, balanced
    // braces/brackets, no raw control chars, key fields present
    s.startsWith("{") && s.endsWith("}") &&
      s.count(_ == '{') == s.count(_ == '}') &&
      s.count(_ == '[') == s.count(_ == ']') &&
      !s.exists(_.isControl) &&
      s.contains("\"metric\":\"total\"") && s.contains("\"adjudicated\":")
  }

  test("micro line stays bounded and parseable at a hostile shape") {
    val nastyReason = ("boom\nwith \"quotes\" and \\slashes\\ " * 50)
    val line = Bench.microLine(123456.789, 10000, 99, adjudicated = false,
      Some(nastyReason), 31.5, 10000, 10000, 8, "/some/very/long/" + ("x" * 500),
      "/tmp/some \"weird\"\npath/" + ("y" * 400) + ".json")
    assert(line.length < 1000, s"micro line too long: ${line.length}")
    assert(parseable(line), s"not parseable: $line")
    assert(!line.contains("\n"))
  }

  test("micro line round-trips the headline scalars") {
    val line = Bench.microLine(67.851, 134, 19, adjudicated = true,
      None, 1.99, 0, 4, 2, "/root/testdata/sf0.1", "bench/bench_r19.json")
    assert(line.length < 600)
    assert(parseable(line))
    assert(line.contains("\"value\":67.851"))
    assert(line.contains("\"n_queries\":134"))
    assert(line.contains("\"requeue_failed\":null"))
    assert(line.contains("\"full_record\":\"bench/bench_r19.json\""))
  }
}
