package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.SecFixture
import graft.query.cypher.CypherCompiler

/** The metrics/agent/MCP query corpus — the label-less, untyped, and
  * templated shapes the reference's PLATFORM code emits (as opposed to
  * the demo examples, covered by SecDemoCorpusSpec):
  * metrics_service.py:262/274, financial.py:411-412,
  * example_queries_tool.py, data_tools.py backtick templates. Run
  * verbatim-shaped against the SEC fixture store. */
class MetricsCorpusSpec extends SparkTestBase {

  private lazy val store = SecFixture.ingest(
    spark, Files.createTempDirectory("graft-metrics").toString, "metrics")
  private def run(q: String) = new CypherCompiler(store).run(q)

  test("metrics: label-less node counts and label discovery") {
    // metrics_service.py:262
    val labels = run("MATCH (n) RETURN DISTINCT LABEL(n) AS label")
      .collect().map(_.getString(0)).toSet
    assert(labels.contains("Entity") && labels.contains("Fact"))
    // example_queries_tool.py: estimatedBytes arithmetic over count(n)
    val est = run(
      "MATCH (n) RETURN count(n) as nodeCount, count(n) * 100 as estimatedBytes")
      .collect()(0)
    assert(est.getLong(0) > 0 && est.getLong(1) === est.getLong(0) * 100)
  }

  test("metrics: rel-scan shapes — count, DISTINCT LABEL(r), per-type counts") {
    // metrics_service.py:274
    val types = run("MATCH ()-[r]->() RETURN DISTINCT LABEL(r) AS relationshipType")
      .collect().map(_.getString(0)).toSet
    assert(types.contains("REPORT_HAS_FACT"))
    val total = run("MATCH ()-[r]->() RETURN count(r) as count")
      .collect()(0).getLong(0)
    assert(total > 0)
    val perType = run(
      "MATCH ()-[r]->() RETURN type(r) as rel_type, count(r) as count ORDER BY rel_type")
      .collect()
    assert(perType.map(_.getLong(1)).sum === total)
  }

  test("metrics: backticked template labels/rel types parse and count") {
    // data_tools.py fills `{label}` / `{rel_type}` into backticks
    val n = run("MATCH (n:`Element`) RETURN count(n) as count")
      .collect()(0).getLong(0)
    assert(n > 0)
    val r = run("MATCH ()-[r:`FACT_HAS_ELEMENT`]->() RETURN count(r) as count")
      .collect()(0).getLong(0)
    assert(r > 0)
  }

  test("agent: any-rel hop with labels(m)[0] subscript") {
    // financial.py:411-412 + the neighborhood-probe shape
    // `MATCH (n)-[r]->(m) WHERE id(n) = … RETURN type(r), labels(m)[0]`
    val anyEntity = run("MATCH (e:Entity) RETURN id(e) AS eid LIMIT 1")
      .collect()(0).getString(0)
    val rows = run(
      s"""MATCH (n:Entity)-[r]->(m)
          WHERE id(n) = '$anyEntity'
          RETURN type(r) as rel_type, labels(m)[0] as target_type""")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) != null))
    // the agent's aggregate form over the whole label
    val agg = run(
      """MATCH (e:Entity)-[r]->(n)
         RETURN type(r) as rel_type, count(*) as cnt ORDER BY rel_type""")
      .collect()
    assert(agg.nonEmpty)
  }

  test("bare node variable return with LIMIT (RETURN n / RETURN e)") {
    val full = run("MATCH (e:Entity) RETURN e LIMIT 10").collect()
    assert(full.length > 0 && full.length <= 10)
    // label-less bare var exposes the id/label surface
    val anon = run("MATCH (n) RETURN n LIMIT 5").collect()
    assert(anon.length === 5)
  }

  test("subscript semantics: 0-based, negative from the end") {
    val row = run(
      """MATCH (e:Entity) WITH collect(e.identifier) AS ids
         RETURN ids[0] AS first_id, ids[-1] AS last_id""").collect()(0)
    assert(row.getString(0) != null && row.getString(1) != null)
  }
}
