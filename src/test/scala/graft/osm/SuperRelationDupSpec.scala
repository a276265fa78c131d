package graft.osm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Regression pin for expandMembers' dedup scope: duplicate DIRECT
  * membership (the same way listed at two positions — an out-and-back
  * route) must survive expansion exactly as the unexpanded path keeps
  * it, while refs reached THROUGH expansion still dedup (the
  * diamond/cycle guard) and an expanded duplicate of a direct member
  * is suppressed. */
class SuperRelationDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val W = 1 // TypeWay
  private val R = 2 // TypeRelation

  private def member(role: String, mtype: Int, ref: Long) =
    struct(lit(role).as("role"), lit(mtype.toByte).as("mtype"),
      lit(ref).as("ref"))

  test("direct duplicates kept; expanded diamonds deduped; expanded copy of a direct ref suppressed") {
    import spark.implicits._
    // root 500: way 10 listed TWICE directly, plus sub-relation 501
    // which lists way 10 (duplicate of a direct member -> suppressed)
    // and way 11 (fresh). Sub-relation 501 is reached once.
    val exploded = Seq(0, 1, 2).toDF("mpos")
      .withColumn("rel_id", lit(500L))
      .withColumn("gclass", lit(2))
      .withColumn("m", when(col("mpos") === 0, member("fwd", W, 10L))
        .when(col("mpos") === 1, member("rev", W, 10L))
        .otherwise(member("sub", R, 501L)))
      .select("rel_id", "gclass", "mpos", "m")
    val all = Seq(501L).toDF("id")
      .withColumn("type", lit(R.toByte))
      .withColumn("members",
        array(member("outer", W, 10L), member("outer", W, 11L)))
      .select("type", "id", "members")

    val out = OsmQueryExec.expandMembers(exploded, all, depth = 2)
      .orderBy("mpos")
      .collect().map(r => (r.getAs[Long]("wref"), r.getAs[String]("role")))

    // both direct listings of way 10 survive, in member order; the
    // expanded copy of 10 (via 501) is suppressed; 11 arrives once
    // with the SUB-relation's role
    assert(out.toSeq === Seq((10L, "fwd"), (10L, "rev"), (11L, "outer")),
      s"got: ${out.toSeq}")
  }
}
