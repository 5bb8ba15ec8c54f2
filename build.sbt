ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "yodeletlspark"
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
// The bench driver parses the forked run's stdout for the {"metric"...}
// JSON line; sbt's default LoggedOutput prefixes every forked line with
// "[info] ", which has defeated that parse for three rounds
// (BENCH_r04..r06 "parsed": null). StdoutOutput passes the child's
// stdout/stderr through unprefixed.
run / outputStrategy := Some(StdoutOutput)
// The bench driver captures only the tail of sbt's output; suppress the
// trailing "[success] Total time" line so the bench JSON line stays last
// and unclipped in that window.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // Pre-size the heap: growing a multi-GB heap from the 512m default
  // during the first heavy query stacks full GCs + expansion stalls
  // onto whatever query runs first (measured at the 100x probe:
  // first-dedup-query 3.2x its steady-state time with -Xmx alone).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The bench/verify mains compile ~2 whole-stage-codegen classes per
  // query plan; across 87 queries x 2 passes the default 240m JIT code
  // cache fills, C2 stops compiling, and every later query runs
  // interpreted - a uniform 2-3x inflation that looks like host load.
  "-XX:ReservedCodeCacheSize=1g",
)
