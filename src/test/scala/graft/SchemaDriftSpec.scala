package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Tripwire for upstream testdata schema drift (round-8 post-mortem:
  * a regenerated events.parquet flipped `ts` from ns BIGINT to
  * timestamp[us] AFTER the round closed and silently killed six
  * queries). Every `SparkEntry.queries` entry must at least ANALYZE
  * against the shipped testdata — pure plan analysis, no execution of
  * the heavy paths — so any schema change upstream goes red in
  * `sbt test` the same day, not in the driver's post-round verify. */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every SparkEntry query analyzes against the shipped testdata schemas") {
    assume(new java.io.File(s"$dir/events.parquet").exists(),
      s"testdata not present at $dir")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries no longer analyze against $dir:\n" +
        failures.mkString("\n"))
  }
}
