ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etl_sprint_25spark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---- Parallel test groups (r17): the full suite is ~37 minutes run
// serially in one JVM — past the CI budget — and the time is
// driver-latency on tiny sf0.001 data, not compute, so suite-level
// parallelism is the lever. Suites are greedily bin-packed into
// isolated forked JVMs by their measured serial durations (seconds,
// from a full -oD run; unlisted suites default small). Isolation per
// group: its own warehouse and derby dir, so saveAsTable names and
// metastore state can never collide across concurrently running
// groups; within a group suites still run sequentially against one
// SparkSession, exactly as before. 6 GiB heap per group JVM is ample
// at sf0.001 (8 groups x 6 GiB stays well under the box).
val testGroupCount = 8
val testSuiteWeights: Map[String, Int] = Map(
  "MoviesSpec" -> 590, "GoldenCdcSpec" -> 274, "CdcSpec" -> 197,
  "IndexMaintenanceSpec" -> 164, "PlansSpec" -> 159,
  "GraphOpsSpec" -> 145, "SinkPropertySpec" -> 89, "UnigramSpec" -> 51,
  "MaintPerturbSpec" -> 49, "TextDedupSimSpec" -> 49,
  "KeysetStreamSpec" -> 48, "ManifestSinkSpec" -> 35,
  "LogSinkSpec" -> 27, "RelationalQueriesSpec" -> 25,
  "StreamingSpec" -> 25, "SketchOpsSpec" -> 23, "WriterRaceSpec" -> 19,
  "CurationOpsSpec" -> 17, "SearchOpsSpec" -> 15, "CdcStreamSpec" -> 14,
  "GoldenIngestSpec" -> 13, "EmptyInputSpec" -> 11,
  "HammingPairsSpec" -> 11, "ReliableCheckpointSpec" -> 11)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseJvmOpts = (Test / javaOptions).value.toVector
  def weightOf(name: String): Int =
    testSuiteWeights.getOrElse(name.split('.').last, 5)
  // greedy longest-processing-time bin packing
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer.empty[sbt.TestDefinition], Array(0)))
  tests.sortBy(t => -weightOf(t.name)).foreach { t =>
    val (buf, w) = bins.minBy(_._2(0))
    buf += t
    w(0) += weightOf(t.name)
  }
  bins.toSeq.zipWithIndex.collect {
    case ((buf, _), i) if buf.nonEmpty =>
      Tests.Group(
        s"graft-tests-$i",
        buf.toSeq,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(
          baseJvmOpts ++ Vector(
            s"-Dspark.sql.warehouse.dir=/tmp/graft-test-wh-$i",
            s"-Dderby.system.home=/tmp/graft-test-derby-$i",
            "-Xmx6g"))))
  }
}
// allow the forked test groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(testGroupCount + 4))
