ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkacdcredshiftspark"
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
// Suite-level parallelism (r18): one forked JVM ran every suite
// sequentially on a local[4] session while the host idled — the full
// suite's wall outgrew the verification budget (r17: the driver's test
// run was killed on wall time). Suites are split across a few forked
// JVMs (each with its own SparkSession; every suite keeps its
// within-JVM behavior). Known-heavy suites are spread round-robin so
// no group inherits two of them; grouping is deterministic (sorted
// names), so reruns land identically. All state the suites touch is
// per-test temp dirs (no shared warehouse/Derby paths), so groups are
// independent.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jo = (Test / javaOptions).value.toVector
  val groups = 4
  val heavy = Set(
    "graft.operators.CutReportMaintenanceSpec",
    "graft.operators.MaintenanceFeedSpec",
    "graft.PipelineSpec",
    "graft.StreamAggsRocksDbSpec",
    "graft.StreamAggsSpec",
    "graft.DataQualitySpec",
    "graft.QueriesExt10Spec",
    "graft.AuditAllSpec",
    "graft.PlanSpec")
  val ordered = tests.sortBy(t => (if (heavy(t.name)) 0 else 1, t.name))
  ordered.zipWithIndex.groupBy(_._2 % groups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1).toVector,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(jo)))
    }
}
// Per-suite wall times in the test log (ScalaTest -oD), so a slow suite
// is visible instead of inferred.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// sbt serializes forked test groups by default (ForkedTestGroup tag
// limit 1) — raise it to match the grouping above, bounded by overall
// task parallelism for everything else.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())))
// Pass the forked app's stdout through unprefixed: the driver parses
// Bench's single JSON line, and sbt's default "[info] " logging prefix
// breaks that.
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
)
