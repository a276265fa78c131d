package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: decompose osm_big_topology cost. Delete before ship. */
object ProfileTopo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = graft.pbf.BigWorld.ensure(graft.queries.OsmQueries.BigPath, 2000000, 100000)

    def timed(name: String)(f: => Long): Unit = {
      // two reps, min — match Bench methodology
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[profile] $name%-28s ${ts.map(_._1).min}%7.2fs rows=${ts.head._2}")
    }

    val q = graft.osm.OsmQuery.highways
    timed("full_scan") { spark.read.format("osmpbf").load(p).count() }
    timed("nodes_only") {
      spark.read.format("osmpbf").load(p).filter(col("type") === 0)
        .select("id", "lon", "lat").count()
    }
    timed("highways_el") {
      spark.read.format("osmpbf").option("mustTagKeys", "highway").load(p)
        .filter(graft.osm.OsmQueryExec.tagPredicate(q, col("tags")) && col("type") === 1)
        .count()
    }
    timed("exploded") {
      spark.read.format("osmpbf").option("mustTagKeys", "highway").load(p)
        .filter(graft.osm.OsmQueryExec.tagPredicate(q, col("tags")) && col("type") === 1)
        .select(col("id"), posexplode(col("refs")).as(Seq("pos", "node"))).count()
    }
    timed("counts_join_nodes") {
      val el = spark.read.format("osmpbf").option("mustTagKeys", "highway").load(p)
        .filter(graft.osm.OsmQueryExec.tagPredicate(q, col("tags")) && col("type") === 1)
      val exploded = el.select(col("id").as("way"), posexplode(col("refs")).as(Seq("pos", "node")))
      val nodes = spark.read.format("osmpbf").load(p).filter(col("type") === 0)
        .select(col("id").as("nid"), col("lon"), col("lat"))
      val counts = exploded.groupBy("node").agg(count(lit(1)).as("n_occ"))
      counts.join(nodes, col("node") === col("nid"), "left").count()
    }
    timed("full_topology") {
      graft.osm.OsmQuery.highways.copy(geometry = true, topology = true).run(spark, p).count()
    }
    timed("topology_nogeom_agg") {
      graft.osm.OsmQuery.highways.copy(geometry = true, topology = true).run(spark, p)
        .groupBy("geom_type").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
