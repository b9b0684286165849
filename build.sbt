ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "olapprojectspark"
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

// r16 (VERDICT r15 #3): the suite wall exceeded the driver's test
// budget (~31 min sequential). Suites run in FOUR forked JVM groups in
// parallel — each group gets its OWN JVM and therefore its own
// SparkSession (TestSpark is a per-JVM lazy val), so no shared-session
// state races across groups; any suite already runs standalone via
// testOnly, which is exactly the isolation this relies on. Heavy
// suites (measured with -oD on the full run: IngestMainSpec 684 s,
// IngestBatchSpec 382 s, DedupSpec 158 s, StreamingIngestSpec 135 s of
// a 2 062 s total) are pinned to separate groups so the wall tracks
// the heaviest group, not the sum. 4 JVMs × local[4] × 8g fits the
// 32-core / 128 GiB bench host with headroom.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def groupOf(name: String): Int = name match {
    case n if n.endsWith("IngestMainSpec") => 0
    case n if n.endsWith("IngestBatchSpec") ||
      n.endsWith("StreamingIngestSpec") => 1
    case n if n.endsWith("DedupSpec") || n.endsWith("SimilaritySpec") ||
      n.endsWith("PlanAuditSpec") || n.endsWith("StreamingStateSpec") => 2
    case _ => 3
  }
  tests.groupBy(t => groupOf(t.name)).toSeq.sortBy(_._1).map {
    case (i, ts) =>
      Tests.Group(s"g$i", ts.sortBy(_.name),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, 4))
