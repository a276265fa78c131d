package graft

import org.scalatest.funsuite.AnyFunSuite

/** The micro record line is the contract between Bench stdout and the
  * harness's 2000-char tail window: it must be ONE complete JSON
  * object, size-bounded and PARSEABLE regardless of inputs (query
  * count, tainted population, requeue failure reason content, env
  * paths, ambient JVM locale), because the slim line's per-query wall
  * dict outgrew the window at ~75 queries and silently nulled the
  * driver's parsed record from round 15 on. Parsing here is REAL
  * (jackson, on the Spark classpath), not a structural approximation. */
class BenchMicroSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(s: String): com.fasterxml.jackson.databind.JsonNode = {
    assert(!s.contains("\n"), "micro line must be one line")
    mapper.readTree(s) // throws on invalid JSON — the real contract
  }

  test("micro line stays bounded and parseable at a hostile shape") {
    val nastyReason = ("boom\nwith \"quotes\" and \\slashes\\ " * 50)
    val line = Bench.microLine(123456.789, 10000, 99, adjudicated = false,
      Some(nastyReason), 31.5, 10000, 10000, 8, 10000,
      "/some/very/long/" + ("x" * 500),
      "/tmp/some \"weird\"\npath/" + ("y" * 400) + ".json")
    assert(line.length < 1000, s"micro line too long: ${line.length}")
    val n = parse(line)
    assert(n.get("adjudicated").asBoolean() === false)
    assert(n.get("requeue_failed").asText().nonEmpty)
  }

  test("bound holds POST-escape: all-backslash string fields (worst case)") {
    // ADVICE r19: the old pre-escape cap let a backslash run double
    // after escaping (reason 200 → 400 chars in the line), exceeding
    // the documented <1000 bound. The cap now applies to the escaped
    // bytes, so the absolute worst input — every string field one long
    // backslash run — must stay bounded AND parse.
    val slashes = "\\" * 2000
    val line = Bench.microLine(123456.789, 10000, 99, adjudicated = false,
      Some(slashes), 31.5, 10000, 10000, 8, 10000, slashes, slashes)
    assert(line.length < 1000, s"micro line too long post-escape: ${line.length}")
    val n = parse(line)
    assert(n.get("requeue_failed").asText().startsWith("\\"))
  }

  test("truncation cannot split an escape pair (dangling-backslash trap)") {
    // review r19 pass 5 + ADVICE r19: a cut landing inside a \\ pair
    // would leave a lone backslash that escapes the closing quote.
    // Park backslash runs across every offset around the 200-byte cap
    // (the cap is now post-escape, so each pad shifts the cut point
    // within the run).
    for (pad <- 90 to 110) {
      val reason = ("a" * pad) + ("\\" * 12) + "\"tail\"" + ("b" * 100)
      val line = Bench.microLine(1.0, 1, 1, adjudicated = true,
        Some(reason), 0.5, 0, 0, 1, 0, "/sf", "/r.json")
      parse(line) // must not throw for ANY cut position
    }
    // and the right-cut (full_record takes its tail): a leading
    // half-pair at the cut edge must be repaired the same way
    for (pad <- 150 to 170) {
      val record = ("c" * 100) + ("\\" * 13) + ("d" * pad)
      val line = Bench.microLine(1.0, 1, 1, adjudicated = true,
        None, 0.5, 0, 0, 1, 0, "/sf", record)
      parse(line)
    }
  }

  test("hostile sf and record paths are escaped, not trusted") {
    val line = Bench.microLine(1.0, 1, 1, adjudicated = true, None, 0.5,
      0, 0, 0, 0, "/data/sf\"0.1\\weird\npath", "(record write FAILED)")
    val n = parse(line)
    assert(n.get("sf").asText().contains("sf'0.1"))
    assert(n.get("full_record").asText() === "(record write FAILED)")
  }

  test("numbers are locale-independent (comma-decimal default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.microLine(67.851, 134, 19, adjudicated = true,
        None, 1.99, 0, 4, 2, 0, "/root/testdata/sf0.1", "bench/bench_r19.json")
      val n = parse(line)
      assert(n.get("value").asDouble() === 67.851)
      assert(n.get("load_max").asDouble() === 1.99)
    } finally java.util.Locale.setDefault(prev)
  }

  test("micro line round-trips the headline scalars") {
    val line = Bench.microLine(67.851, 134, 19, adjudicated = true,
      None, 1.99, 0, 4, 2, 3, "/root/testdata/sf0.1", "bench/bench_r19.json",
      totalFirst = 89.123)
    assert(line.length < 600)
    val n = parse(line)
    assert(n.get("value").asDouble() === 67.851)
    assert(n.get("value_first").asDouble() === 89.123)
    assert(n.get("n_queries").asInt() === 134)
    assert(n.get("requeue_failed").isNull)
    assert(n.get("n_requeue_dropped").asInt() === 3)
    assert(n.get("full_record").asText() === "bench/bench_r19.json")
    assert(n.get("metric").asText() === "total")
  }
}
