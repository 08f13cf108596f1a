package graft

import java.nio.file.Files
import graft.fixtures.AccountingFixture
import graft.serve.{QueryGovernance => QG, QueryQueue, ResultStreamer}
import graft.storage.GraphMetrics

/** Regressions for the second self-review pass (storage/serve). */
class Review2RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("escaped backslash before closing quote cannot hide write keywords") {
    val q = """MATCH (n) WHERE n.path = 'C:\\' DETACH DELETE n"""
    assert(QG.classify(q) === QG.QueryKind.Write)
  }

  test("unbounded and exact var-length paths score complexity") {
    assert(QG.complexityScore("MATCH (a)-[*]->(b) RETURN a LIMIT 10") > 50)
    assert(QG.complexityScore("MATCH (a)-[:R*2..]->(b) RETURN a LIMIT 10") > 50)
    assert(QG.complexityScore("MATCH (a)-[:R*9]->(b) RETURN a LIMIT 10") === 40)
    assert(QG.complexityScore("MATCH (a)-[:R*1..3]->(b) RETURN a LIMIT 10") === 0)
  }

  test("grouped aggregates stream; only global aggregates are Small") {
    import QG.ResultSize._
    assert(QG.analyze("MATCH (f:Fact) RETURN count(f)").estimatedSize === Small)
    assert(QG.analyze(
      "MATCH (f:Fact) RETURN f.identifier, count(*)").estimatedSize === Large)
    assert(QG.analyze(
      "MATCH (f:Fact) RETURN count(f) AS a, sum(f.v) AS b").estimatedSize === Small)
  }

  test("queue evicts finished entries beyond the retention cap") {
    val q = new QueryQueue(maxConcurrent = 2, maxFinishedRetained = 5)
    try {
      val ids = (1 to 12).map(i => q.submit("u")(i).toOption.get)
      ids.foreach(id => q.await(id))
      Thread.sleep(200)
      val retained = ids.count(id => q.statusOf(id).isDefined)
      assert(retained <= 6, s"retained $retained > cap")
      assert(q.statusOf(ids.last).isDefined) // newest survives
    } finally q.shutdown()
  }

  test("queue with maxConcurrent=1 runs at most one query at a time") {
    val q = new QueryQueue(maxConcurrent = 1)
    try {
      val active = new java.util.concurrent.atomic.AtomicInteger(0)
      val peak = new java.util.concurrent.atomic.AtomicInteger(0)
      val ids = (1 to 6).map(_ => q.submit("u") {
        val a = active.incrementAndGet()
        peak.updateAndGet(m => math.max(m, a))
        Thread.sleep(50)
        active.decrementAndGet()
      }.toOption.get)
      ids.foreach(id => assert(q.await(id) === q.Status.Completed))
      assert(peak.get() === 1)
    } finally q.shutdown()
  }

  test("NDJSON handles NaN/Infinity and binary columns with valid JSON") {
    val df = Seq((1L, Double.NaN, Array[Byte](1, 2, 3)),
      (2L, Double.PositiveInfinity, Array[Byte](4)))
      .toDF("id", "x", "payload")
    val lines = ResultStreamer.ndjsonChunks(df, 10).flatten.toSeq
    assert(lines.forall(_.contains("\"x\":null")))
    assert(lines.head.contains("\"payload\":\"AQID\"")) // base64
  }

  test("strict ingest rejects duplicate primary keys loudly") {
    val store = AccountingFixture.ingest(spark,
      Files.createTempDirectory("graft-strict").toString, "st")
    val e = intercept[IllegalArgumentException] {
      store.ingestNodes("Element",
        Seq(("elem1000", "Cash Again")).toDF("identifier", "name"))
    }
    assert(e.getMessage.contains("duplicate primary key"))
    // dup-tolerant path still silently drops
    val n = store.ingestNodes("Element",
      Seq(("elem1000", "Cash Again")).toDF("identifier", "name"),
      Some("f9"), ignoreErrors = true)
    assert(n === 0)
  }

  test("property coverage is one job and still correct") {
    val store = AccountingFixture.ingest(spark,
      Files.createTempDirectory("graft-cov").toString, "cov")
    val cov = GraphMetrics.propertyCoverage(store, "Element").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cov("identifier") === 18L && cov("substitution_group") === 0L)
  }
}
