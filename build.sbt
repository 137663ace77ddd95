ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databrickssalesetlpipelinespark"
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
// Let the forked JVM inherit stdout directly: the driver parses Bench's
// one-line JSON from stdout, and sbt's logger otherwise prepends
// "[info] " to every line, breaking the parse (BENCH_r01 "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // Hard-clamped forked heap. The harness environment exports a ~96 GB
  // SPARK_DRIVER_MEM; at that heap size G1 pause behavior on this box makes
  // every query 5-30x slower (identical code: 68s total at 8g vs 456s+ at
  // 96g, sf0.1 local[32]). 8 GB comfortably fits every sf0.1 query, so the
  // bench measures the engine, not GC ergonomics. Intentionally NOT
  // env-overridable upward.
  "-Xmx8g",
)
