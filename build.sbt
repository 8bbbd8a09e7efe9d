ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databricks_data_warehousespark"
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
// The bench driver parses the FINAL stdout line as the result JSON; sbt's
// "[success] Total time" epilogue would land after graft.Bench's output and
// break that parse (BENCH_r01/r02 both recorded "parsed": null).
Global / showSuccess := false
// ...and the forked JVM must write straight to stdout, not through sbt's
// logger, which would decorate the JSON line with an "[info] " prefix.
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
  // 8g, NOT bigger: Spark's ContextCleaner reclaims shuffle/broadcast
  // state only when the JVM garbage-collects, and a 24g heap in a
  // 75-query single-JVM run GC'd so rarely that late queries hit
  // 10-45 s full-GC stalls (measured: bench total 74-159 s at 24g,
  // 56-60 s at 8g on the same data — the smaller heap collects often
  // and briefly)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// `sbt test` wall time: one sequential forked JVM ran the 20 suites'
// thousands of tiny local[4] Spark stages end to end (>1 h under host CPU
// steal). Suites are independent — each talks to its own TestSpark session
// and its own temp warehouse — so split them into forked GROUPS that run
// CONCURRENTLY, one JVM per group: process isolation keeps every
// session-global mutation (ScaleSpec's broadcast-threshold toggle,
// PipelineSpec's catalog registration) scoped to its group, which
// suite-level in-JVM parallelism would not. The long poles get a JVM each;
// everything else hash-buckets into the remainder. 8 groups (6 solo + 2
// hash buckets) × local[4] × 8g fits 32 cores / 128 GiB with room to spare.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory((Test / baseDirectory).value)
  val soloSuites = Set("graft.PipelineSpec", "graft.PropertySpec",
    "graft.NorthStarSpec", "graft.QueriesSpec", "graft.StreamingSpec",
    "graft.ScaleSpec")
  val (solo, rest) = tests.partition(t => soloSuites.contains(t.name))
  val restGroups = rest.groupBy(t => math.abs(t.name.hashCode) % 2)
  (solo.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(forkOpts))) ++
    restGroups.toSeq.sortBy(_._1).map { case (i, ts) =>
      Tests.Group(s"graft.rest$i", ts, Tests.SubProcess(forkOpts))
    }).toVector
}
// Forked test groups are serialized by default (ForkedTestGroup limit 1);
// let all groups run at once. `:=` (not `++=`) intentionally REPLACES
// sbt's default restrictions (incl. the CPU-tag limit) — the forked JVMs
// do the real work here and the remaining in-process tasks are cheap.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16))
