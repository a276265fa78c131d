package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** VERDICT r17 task 8: the curation corpus landed bucketed on
  * `doc_id` turns the curation family's doc-keyed joins exchange-free
  * on the corpus side. Pins two plan contracts over a BucketedSink
  * copy of `documents`:
  *  1. a drop-set ANTI JOIN (the pipe_clean_corpus / fullCuration
  *     shape) where the drop set derives narrowly from the same
  *     bucketed scan plans with ZERO Exchange anywhere — at 100 TB
  *     this is the whole dedup-subtraction stage reading
  *     pre-partitioned data on both sides;
  *  2. the pipe_keep_best attach join (bucketed docs ⋈ computed
  *     cluster table on doc_id) pays exactly ONE Exchange — the
  *     computed side — where the plain-parquet form pays TWO; the
  *     corpus, the big side, never shuffles.
  * Results are checked equal to the plain-parquet twins, and
  * broadcast is disabled so the claims are about the sort-merge path
  * a fact-sized corpus takes. */
class CurationBucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // raw substring count — both plans are rendered by the same Spark,
  // so the comparison (fewer on the bucketed form) is format-stable
  private def countExchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).size

  test("bucketed corpus: narrow drop-set anti-join plans with zero Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bdocs").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    BucketedSink.writeBucketed(docs, "b_docs", s"$dir/docs", "doc_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val b = spark.table("b_docs")
      // drop set derived NARROWLY from the same bucketed scan (filter
      // + project preserve the bucket partitioning) — the shape of a
      // quality-gate or id-policy drop
      val drop = b.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("did"))
      val survivors = b.join(drop, b("doc_id") === drop("did"), "left_anti")
        .select("doc_id", "n_chars")
      val plan = survivors.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ anti:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed anti-join planned a shuffle — corpus co-location lost:\n$plan")
      val got = survivors.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val expected = docs.filter(col("doc_id") % 7 =!= 0)
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_docs")
    }
  }

  test("pipe_keep_best attach join: bucketed corpus side never shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bdocs2").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    BucketedSink.writeBucketed(docs, "b_docs2", s"$dir/docs", "doc_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // a COMPUTED cluster table (aggregation forces its own shuffle),
      // standing in for the connected-components labels
      def clusters(src: org.apache.spark.sql.DataFrame) =
        src.select(col("doc_id"), (col("doc_id") % 13).as("g"))
          .groupBy("g").agg(min("doc_id").as("cluster_id"))
          .join(src.select(col("doc_id"), (col("doc_id") % 13).as("g")), "g")
          .select("doc_id", "cluster_id")
      def attach(corpus: org.apache.spark.sql.DataFrame) =
        corpus.select("doc_id", "n_chars")
          .join(clusters(corpus), Seq("doc_id"), "left")
      val bucketedPlan = attach(spark.table("b_docs2"))
        .queryExecution.executedPlan.toString
      val plainPlan = attach(docs).queryExecution.executedPlan.toString
      val nB = countExchanges(bucketedPlan)
      val nP = countExchanges(plainPlan)
      assert(nB < nP,
        s"bucketing saved no exchange: bucketed=$nB plain=$nP\n$bucketedPlan")
      // value parity between the two forms
      val got = attach(spark.table("b_docs2"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val expected = attach(docs).orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_docs2")
    }
  }
}
