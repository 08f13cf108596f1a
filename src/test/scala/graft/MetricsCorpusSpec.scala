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

  test("schema discovery: WITH labels/keys then chained UNWINDs (schema/utils.py)") {
    // routers/graphs/schema/utils.py — the exact emitted text
    val rows = run(
      """MATCH (n)
         WITH labels(n) as labels, keys(n) as props
         UNWIND labels as label
         UNWIND props as prop
         RETURN DISTINCT label, collect(DISTINCT prop) as properties""")
      .collect()
    val byLabel = rows.map(r => r.getString(0) ->
      r.getSeq[String](1).toSet).toMap
    assert(byLabel.contains("Entity") && byLabel.contains("Fact"))
    assert(byLabel("Entity").contains("cik"))
    assert(byLabel("Fact").contains("numeric_value"))
  }

  test("NOT EXISTS dimension filter (facts_tool.py) matches the anti-join") {
    val undimmed = run(
      """MATCH (f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         WHERE f.numeric_value IS NOT NULL
               AND NOT EXISTS((f)-[:FACT_HAS_DIMENSION]->())
         RETURN count(f) AS n""").collect()(0).getLong(0)
    val dimmed = run(
      """MATCH (f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         WHERE f.numeric_value IS NOT NULL
               AND EXISTS((f)-[:FACT_HAS_DIMENSION]->())
         RETURN count(f) AS n""").collect()(0).getLong(0)
    val all = run(
      """MATCH (f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         WHERE f.numeric_value IS NOT NULL
         RETURN count(f) AS n""").collect()(0).getLong(0)
    assert(undimmed > 0 && dimmed > 0)
    assert(undimmed + dimmed === all)
  }

  test("MATCH after WITH: count-then-rematch (save_view.py)") {
    val row = run(
      """MATCH (r:Report {identifier: 'rep_a_10k'})-[:REPORT_HAS_FACT]->(f:Fact)
         WITH count(f) as fact_count
         MATCH (r:Report {identifier: 'rep_a_10k'})
         RETURN r.identifier AS rid, fact_count""").collect()
    assert(row.length === 1)
    assert(row(0).getString(0) === "rep_a_10k")
    assert(row(0).getLong(1) === 100L) // 25 elements × 4 quarters
  }

  test("collect({…}) map literal (element_mapping.py shape)") {
    val rows = run(
      """MATCH (r:Report {identifier: 'rep_a_10k'})
         OPTIONAL MATCH (r)-[:REPORT_HAS_FACT]->(f:Fact)
         RETURN r.identifier AS rid,
                collect({identifier: f.identifier, value: f.numeric_value}) as facts""")
      .collect()
    assert(rows.length === 1)
    val facts = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(facts.length === 100)
    assert(facts.head.schema.fieldNames.toSeq === Seq("identifier", "value"))
  }

  test("subscript semantics: 0-based, negative from the end") {
    val row = run(
      """MATCH (e:Entity) WITH collect(e.identifier) AS ids
         RETURN ids[0] AS first_id, ids[-1] AS last_id""").collect()(0)
    assert(row.getString(0) != null && row.getString(1) != null)
  }
}
