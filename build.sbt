ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "robosystemsspark"
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

// ---- Parallel forked test groups (r18: `sbt test` must finish inside
// the driver's wall budget even on a slow box — the r17 verify ran the
// suite sequentially in one JVM at ~21 min local / timed out at 5×).
// Suites are bin-packed by measured duration into N forked JVMs that
// run CONCURRENTLY. Isolation is the JVM: each group gets its own
// SparkSession (local[4]) and temp dirs, so no shared-session conf
// races are possible. The three suites that touch FIXED scratch paths
// (/tmp/graft-sgate, /tmp/graft-stgate via SparkEntry gates) are
// pinned into one group. 4 groups × local[4] = 16 cores, 4 × 8g heap.
val testForkGroups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jvmOpts = (Test / javaOptions).value.toVector
  val base = baseDirectory.value
  // measured wall seconds (r18 baseline run, quiet box); unlisted
  // suites are small — default 4 s
  val weights: Map[String, Int] = Map(
    "graft.PropertySpec" -> 124, "graft.IndexPropertySpec" -> 180,
    "graft.CrawlLoopSpec" -> 195,
    "graft.MinHashIndexSpec" -> 82, "graft.StreamingGateSpec" -> 60,
    "graft.TieredCompactionSpec" -> 57, "graft.EmbedIndexSpec" -> 49,
    "graft.Round10ReviewSpec" -> 39, "graft.StorageOpsSpec" -> 37,
    "graft.PipelineSpec" -> 31, "graft.Bm25IndexSpec" -> 30,
    "graft.CypherWriteSpec" -> 26, "graft.MetricsCorpusSpec" -> 24,
    "graft.SecViewsSpec" -> 24, "graft.IvfIndexSpec" -> 23,
    "graft.Round16ReviewSpec" -> 19, "graft.PointWriteSpec" -> 17,
    "graft.CypherSpec" -> 17, "graft.ServeSpec" -> 15,
    "graft.SketchProfilingSpec" -> 13, "graft.StorageGateSpec" -> 11,
    "graft.StreamingSpec" -> 10, "graft.PqIvfIndexSpec" -> 10)
  val pinned = Set("graft.StreamingGateSpec", "graft.EntrySmokeSpec",
    "graft.Round12ReviewSpec")
  def w(n: String): Int = weights.getOrElse(n, 4)
  val n = math.max(1, testForkGroups)
  val loads = Array.fill(n)(0L)
  val members =
    Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
  def place(ts: Seq[TestDefinition]): Unit = {
    val bin = loads.indexOf(loads.min)
    loads(bin) += ts.map(t => w(t.name).toLong).sum
    members(bin) ++= ts
  }
  val (pin, rest) = tests.partition(t => pinned.contains(t.name))
  // heaviest first (greedy LPT); the pinned trio places as one unit
  val units: Seq[Seq[TestDefinition]] =
    (if (pin.nonEmpty) Seq(pin.toSeq) else Nil) ++ rest.map(Seq(_))
  units.sortBy(-_.map(t => w(t.name).toLong).sum).foreach(place)
  val forkOpts = ForkOptions()
    .withRunJVMOptions(jvmOpts)
    .withWorkingDirectory(Option(base))
  members.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toVector, Tests.SubProcess(forkOpts))
  }
}
// sbt's default limits forked test groups to ONE at a time; allow all
// groups to run concurrently (each is its own JVM)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(8, testForkGroups + 4)),
  Tags.limit(Tags.ForkedTestGroup, testForkGroups))
