ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cloudtrailstreamerspark"
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
// Keep sbt's "[success] Total time: …" epilogue off stdout: the bench
// harness parses the LAST stdout line as JSON (round-1 bench was
// dropped because the epilogue followed graft.Bench's JSON line).
Global / showSuccess := false
// Route the forked JVM's stdout STRAIGHT to sbt's stdout instead of
// through the sbt logger: the logger prefixes every line with
// "[info] ", which broke the bench harness's JSON tail-parse in
// round 3 ("[info] {\"metric\":...}" is not JSON). Set in every scope
// `run`/`runMain` might resolve from.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // Round-12 (OPTIMIZATION_r12.md): 16g default heap (the sandbox has
  // 128 GiB; 8g left the 14-stream suite GC-bound in spots) and a 1g
  // JIT code cache — the suite compiles ~1500 whole-stage-codegen
  // classes and the 240 MB default fills mid-run, triggering
  // flush/deopt storms that showed as a reproducible ~20-30% slowdown
  // of the SECOND timed pass (passes [62.3, 84.4, 65.9] -> [55.9,
  // 66.5, 54.2] with the larger cache, same window quality). The
  // low-memory certification still overrides via SPARK_DRIVER_MEM=2g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:ReservedCodeCacheSize=1g",
)
Global / excludeLintKeys += showSuccess
