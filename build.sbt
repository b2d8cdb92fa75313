ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databricksimportpysparkscriptsspark"
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
// The driver parses the LAST line of `sbt -batch "runMain graft.Bench"`
// stdout as JSON. Two pieces of sbt furniture defeated that for three
// rounds: the logger's "[info] " prefix on forked-process output and the
// trailing "[success] Total time" banner. StdoutOutput passes the forked
// JVM's stdout through verbatim; showSuccess kills the banner.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not a task, so the unused-key
// lint false-positives on it.
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
  // local[32] with array-heavy shuffles (dedup pair enumeration, broadcast
  // embeddings) GC-thrashes in small heaps and corrupts bench timings; the
  // machine has 128 GiB, so default generously.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Whole-stage-codegen classes overflow the JIT code cache mid-bench;
  // once full the compiler shuts off and later queries run interpreted
  // with wild run-to-run variance. 42 queries broke the 240 MB default;
  // the 277-query surface measurably degraded mid-run at 1g (2-13x
  // inflation on alphabetically-late queries, gone when re-run in
  // isolation) — 2g is the JVM maximum.
  "-XX:ReservedCodeCacheSize=2g",
  // generated classes also churn class metadata; keep unloading healthy
  "-XX:+ClassUnloadingWithConcurrentMark",
)
