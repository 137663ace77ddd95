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
// Forked-JVM heap: min(SPARK_DRIVER_MEM, 8g), with SPARK_GRAFT_XMX as an
// explicit escape hatch for memory-heavy runs at larger scale factors.
// The harness environment exports a ~96 GB SPARK_DRIVER_MEM; at that heap
// size every query runs 5-30x slower on this box REGARDLESS of collector
// (identical code, sf0.1 local[32]: G1 8g 45s vs 96g 456s; ParallelGC 8g
// 39s vs 96g 291s), so it is not a G1-specific pathology — a huge heap
// itself is hostile here (first-touch page faults, giant young-gen
// copies). 8 GB comfortably fits every sf0.1 query, so the bench
// measures the engine, not memory ergonomics. ParallelGC is kept: ~15%
// faster than G1 at 8g for this batch workload.
def memToMb(s: String): Option[Long] = {
  val m = "(?i)^\\s*(\\d+)\\s*([kmgt]?)b?\\s*$".r
  s match {
    case m(n, unit) =>
      val bytes = unit.toLowerCase match {
        case "k" => n.toLong * 1024L
        case "" | "m" => n.toLong * 1024L * 1024
        case "g" => n.toLong * 1024L * 1024 * 1024
        case "t" => n.toLong * 1024L * 1024 * 1024 * 1024
      }
      Some(math.max(1L, bytes / (1024L * 1024)))
    case _ => None
  }
}
val forkedXmxMb: Long = {
  val capMb = 8192L
  sys.env.get("SPARK_GRAFT_XMX").flatMap(memToMb).getOrElse {
    val envMb = sys.env.get("SPARK_DRIVER_MEM").flatMap(memToMb).getOrElse(capMb)
    if (envMb > capMb)
      println(s"[build] SPARK_DRIVER_MEM=${envMb}m capped to ${capMb}m for the " +
        "forked JVM (large G1 heaps are 5-30x slower here); set SPARK_GRAFT_XMX to override")
    math.min(envMb, capMb)
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${forkedXmxMb}m",
  "-XX:+UseParallelGC",
)
