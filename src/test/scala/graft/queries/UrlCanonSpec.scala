package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins `PipelineOps.canonicalizeUrl` (the pipe_url_dedup key):
  *  - each rule individually (fragment, scheme/host case, www.,
  *    default port, trailing slash, tracking params);
  *  - property: IDEMPOTENCE — canon(canon(u)) == canon(u) over the
  *    full residue-crossed messy corpus, so re-running the dedup
  *    stage over already-canonical keys is a no-op;
  *  - non-default ports, case-sensitive paths, and real query params
  *    survive untouched. */
class UrlCanonSpec extends AnyFunSuite {

  private def canon(urls: Seq[String]): Seq[String] = {
    val spark = graft.sources.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.toDF("u")
      .select(PipelineOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("each canonicalization rule fires") {
    val in = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/One/#frag",
      "http://example.com:80/a?utm_source=x&page=2&fbclid=abc",
      "https://example.com",
      "https://example.com/?gclid=1",
      "https://example.com:8080/UPPER/Path?q=Mixed%20Case",
      // review r18: port stripping is scheme-aware — :80 on https and
      // :443 on http are REAL distinct origins and must survive
      "https://example.com:80/x",
      "http://example.com:443/x",
      // review r18: repeated www. / trailing slashes strip fully in
      // ONE pass (the idempotence hazard)
      "https://WWW.www.example.com/a//",
      "https://example.com//")
    assert(canon(in) === Seq(
      "https://example.com/Docs/One",
      "http://example.com/a?page=2",
      "https://example.com/",
      "https://example.com/",
      // non-default port kept; path/query case preserved
      "https://example.com:8080/UPPER/Path?q=Mixed%20Case",
      "https://example.com:80/x",
      "http://example.com:443/x",
      "https://example.com/a",
      "https://example.com/"))
  }

  test("idempotent on the shapes one-at-a-time stripping broke") {
    val tricky = Seq(
      "https://www.www.example.com/a//",
      "https://example.com/a///?utm_a=1&b=2#f",
      "https://WWW.example.com:443///")
    val once = canon(tricky)
    assert(canon(once) === once)
  }

  test("idempotent over the residue-crossed messy corpus") {
    // every combination the messyUrl builder can emit (2·2·2·2·3·2
    // residue classes), plus edge shapes
    val schemes = Seq("https://", "HTTPS://")
    val wwws = Seq("", "WWW.")
    val ports = Seq("", ":443")
    val slashes = Seq("", "/")
    val queries = Seq("", "?utm_source=feed", "?utm_source=feed&page=2", "?page=2")
    val frags = Seq("", "#section-3")
    val urls = for {
      s <- schemes; w <- wwws; p <- ports; sl <- slashes
      q <- queries; f <- frags
    } yield s"${s}${w}src7.EXAMPLE.com${p}/docs/23${sl}${q}${f}"
    val once = canon(urls)
    val twice = canon(once)
    assert(twice === once)
    // and the whole family collapses to exactly two canonical keys
    // (with and without the kept page param)
    assert(once.toSet === Set(
      "https://src7.example.com/docs/23",
      "https://src7.example.com/docs/23?page=2"))
  }
}
