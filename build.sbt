ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataingestionframeworkspark"
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
// Forked run output goes straight to stdout (no "[info] " logger
// prefix) so Bench's single JSON line is machine-parseable from the
// sbt invocation's stdout.
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
  // pin the heap: without -Xms, the bench's inter-query settle
  // (forced full GCs) lets G1 uncommit and shrink the young gen, so
  // every query restarts on a cold heap and pays minor-GC churn that
  // reads as plan cost (r19: board gc_ms 7.3 s -> 17.7 s from the
  // settle alone until pinned)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// r22: SHARD test suites across concurrently forked JVMs. The suite
// is 392 tests / ~24 min sequential — past the driver's test budget
// (r21's run was killed mid-suite). Suites mutate shared-session
// runtime conf (timezone, AQE coalesce, materialize strategy), so
// in-JVM suite parallelism would cross-talk; separate JVMs each get
// their own SparkSession and are isolation-safe. Shards are balanced
// by measured suite durations (StreamingSpec's incremental members
// were additionally split into two sibling classes — no test changed
// or removed). 5 shards x local[4] sessions fit the 32-core host;
// each fork reuses the Test javaOptions (module opens + pinned heap).
val testShard: String => Int = Map(
  "graft.StreamingIncrementalDedupSpec" -> 0,
  "graft.PlanSpec" -> 0,
  "graft.StreamingIncrementalSpec" -> 1,
  "graft.QuantileSketchSpec" -> 1,
  "graft.ConfigSpec" -> 2,
  "graft.DedupSpec" -> 2,
  "graft.MergeSpec" -> 3,
  "graft.CoreQueriesSpec" -> 3,
  "graft.StreamingIncrementalDedup2Spec" -> 5,
  "graft.TextAnalysisSpec" -> 5,
  "graft.KernelEquivalenceR21Spec" -> 5,
).withDefaultValue(4)
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => testShard(t.name)).toSeq.sortBy(_._1)
    .map { case (shard, suites) =>
      Tests.Group(s"shard$shard", suites,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(8))
