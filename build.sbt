ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spk_sl_validationspark"
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
// Forked `run` output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that breaks any harness that parses the one
// JSON line Bench/Verify print. Inherit stdout/stderr instead so the JSON
// line reaches the console verbatim.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's own "[success] Total time: …" epilogue would STILL land
// after the JSON line (it broke downstream parsing three rounds running)
// — suppress it so the protocol line is the last thing on stdout.
Global / showSuccess := false
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
  // 28g default: the full 48-query bench accumulates every fan-out
  // cache (SURVEY.md §4.2) in one JVM; at 16g storage eviction was
  // recomputing persisted frames mid-bench (x25 1.5s isolated vs 7s
  // in-suite). The machine has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
