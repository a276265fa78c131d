ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osmdatapyspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Bench prints ONE machine-read JSON line on stdout; sbt's default
// logger decorates forked-process output with [info]/[error] prefixes,
// which breaks the harness's JSON parse (BENCH_r02.json: parsed=null).
// StdoutOutput passes the child's streams through undecorated.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Fixed-size, pre-touched heap for `run` (Bench/Verify/probes) ONLY:
// the r16 driver bench showed 10-30x CPU inflation on allocation-heavy
// rows that fresh same-code runs could not reproduce — consistent with
// host-state-dependent page fault/reclaim cost landing inside timed
// reps. Pre-touching at JVM start moves first-touch cost out of
// measurements and off the degraded-host failure path (~1-2 s per
// forked JVM, paid once). NOT applied to test JVMs: committing the
// full 8 GB up front would fail `sbt test` outright on a small host
// where the lazy commit runs fine (review r17).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
