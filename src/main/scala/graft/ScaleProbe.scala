package graft

import org.apache.spark.sql.SparkSession

/** One-off throughput probe at the reference's demo scale (Marseille ≈
  * 6.97M cached nodes, BASELINE.md): generates a 7M-node / 700k-way
  * synthetic extract, then times full-scan info(), the node coordinate
  * table build (the reference's "geometry cache"), the POI query and
  * highway topology. Prints one JSON line. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = "/tmp/graft_marseille_scale.osm.pbf"
    val t0 = System.nanoTime()
    graft.pbf.BigWorld.ensure(path, 7000000, 700000)
    val tGen = (System.nanoTime() - t0) / 1e9

    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }

    val f = new graft.osm.OsmFile(spark, path)
    val (info, tInfo) = timed(f.info())
    val (nGeo, tGeo) = timed(f.geometry().count())
    val (nPois, tPois) = timed(
      graft.osm.OsmQuery.pois.copy(geometry = true).run(spark, path).count())
    val (nTopo, tTopo) = timed(
      graft.osm.OsmQuery.highways.copy(geometry = true, topology = true)
        .run(spark, path).count())

    println(f"""{"gen_s":$tGen%.1f,"blobs":${info("blobs")},"nodes":${info("nodes")},"ways":${info("ways")},"info_s":$tInfo%.1f,"geometry_cache_rows":$nGeo,"geometry_cache_s":$tGeo%.1f,"pois_rows":$nPois,"pois_s":$tPois%.1f,"topology_rows":$nTopo,"topology_s":$tTopo%.1f}""")
    spark.stop()
  }
}
