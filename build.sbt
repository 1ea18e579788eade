ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bytewaxspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " sbt
// decoration) so Bench's one-line JSON is machine-parseable from stdout.
run / outputStrategy := Some(StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line so Bench's
// compact JSON summary is the true last line of stdout (the driver
// tail-captures a bounded buffer and parses the end).
Global / showSuccess := false
Global / showTiming := false
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
  // Pin -Xms to -Xmx: the first allocation-heavy job otherwise pays
  // heap-growth + GCLocker-retry thrash (measured 231 s -> 29 s on
  // the sf0.1 triangle wedge join — a 7x first-run artifact, not
  // algorithm cost).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JIT code cache: the 225-query suite compiles thousands of
  // whole-stage-codegen classes in one JVM; at the JDK 17 default
  // (240 MB) the cache fills mid-suite and the sweeper/disabled-JIT
  // tail runs CPU-bound queries 2-3x slower STABLY (measured r16:
  // q_graph_hits 17.4 s in-suite vs 7.1 s isolated, q_graph_kcore
  // 5.3 vs 2.2 — same classes, same plans). Reserved, not committed,
  // so a larger reservation costs nothing when unused.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
