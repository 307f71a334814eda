ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pagopaecommercecdcservicespark"
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
// The forked run's stdout must reach the caller UNPREFIXED: the driver
// parses the one JSON line Bench prints, and sbt's default logger turns
// it into "[info] {...}" which fails json.loads (BENCH_r01 was lost to
// exactly this). StdoutOutput passes the child's stdout through verbatim.
// project-level (not run-scoped) so runMain/run in any config inherit it
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g: the 38-query bench surface at sf0.1 carries several persisted
  // dedup intermediates + checkpoint blocks concurrently across 32 local
  // executor threads; 8g GC-thrashed once the surface grew past ~35
  // queries (the box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The 53-query bench surface JIT-compiles thousands of generated
  // whole-stage-codegen classes (× warmup + measured SFs + streams); the
  // JDK-17 default ReservedCodeCacheSize=240m can fill mid-run, at which
  // point the JIT shuts off and EVERYTHING after runs interpreted — the
  // round-2 driver bench degraded exactly this way (late queries uniformly
  // 10-20× their local cost, stream throughput 4× down). 1g leaves the
  // sweeper headroom it never had.
  "-XX:ReservedCodeCacheSize=1g",
)
