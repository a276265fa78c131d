package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Pins the `text_repetition` kernel (Gopher-style repetition quality
  * signals) on hand-computed fixtures: bigram argmax with the
  * (count DESC, bigram ASC) tie-break, duplicate-token fraction, and
  * the degenerate single-token / all-unique documents. */
class TextRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("textrep").toString
    import spark.implicits._
    Seq(
      // "a b a b a": bigrams {a b: 2, b a: 2} -> tie -> "a b"; every
      // token duplicated -> dup 1.0; frac = 2*3/9
      (0L, "a b a b a"),
      // all unique tokens: dup 0.0, every bigram count 1 ->
      // lexicographically smallest bigram "one two"... order of words:
      // bigrams {"one two","two three","three four"} -> "one two"
      (1L, "one two three four"),
      // single token: no bigram -> null / 0.0; dup 0.0
      (2L, "solo"),
      // dominant repeated bigram: "x y x y x y z" -> "x y" count 3,
      // frac = 3*3/13; dup tokens: x(3) y(3) -> 6/7
      (3L, "x y x y x y z"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition signals match hand-computed values") {
    val rows = TextOps.queries("text_repetition")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.length === 4)
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(0L) === ((0L, Some("a b"),
      graft.functions.Num.roundHalfUp(2.0 * 3 / 9, 6), 1.0)))
    assert(byId(1L) === ((1L, Some("one two"),
      graft.functions.Num.roundHalfUp(1.0 * 7 / 18, 6), 0.0)))
    assert(byId(2L) === ((2L, None, 0.0, 0.0)))
    assert(byId(3L) === ((3L, Some("x y"),
      graft.functions.Num.roundHalfUp(3.0 * 3 / 13, 6),
      graft.functions.Num.roundHalfUp(6.0 / 7, 6))))
  }

  test("plan is a single narrow pass - no shuffle") {
    val plan = TextOps.queries("text_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    // the trailing orderBy is the only exchange allowed (rangepartition
    // for the global sort); no hash-partition shuffle may appear
    assert(!plan.contains("hashpartitioning"),
      s"unexpected aggregation shuffle in:\n$plan")
  }
}
