package graft

import java.nio.file.Files
import graft.fixtures.SecFixture
import graft.query.cypher.CypherCompiler

/** The sec_demo query corpus (examples/sec_demo/query_examples.py)
  * run verbatim-shaped through the Cypher front end against the SEC
  * fixture — the queries a reference user actually executes. */
class SecDemoCorpusSpec extends SparkTestBase {

  private lazy val store = SecFixture.ingest(
    spark, Files.createTempDirectory("graft-secdemo").toString, "demo")
  private def run(q: String) = new CypherCompiler(store).run(q)

  test("report_facts: 3-hop with IS NOT NULL and two-key ordering") {
    val df = run(
      """MATCH (r:Report)-[:REPORT_HAS_FACT]->(f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         WHERE f.numeric_value IS NOT NULL
         RETURN r.period_end_date AS report_date, e.name AS element_name,
                f.numeric_value AS value, f.decimals AS decimals,
                f.fact_type AS fact_type
         ORDER BY report_date DESC, element_name
         LIMIT 30""")
    val rows = df.collect()
    assert(rows.length === 30)
    val dates = rows.map(_.getAs[String]("report_date"))
    assert(dates.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("fact_dimensions: dimensional qualifier counts") {
    val df = run(
      """MATCH (f:Fact)-[:FACT_HAS_DIMENSION]->(fd:FactDimension)
         RETURN fd.axis_uri AS axis, fd.member_uri AS member,
                fd.type AS dimension_type, count(f) AS fact_count
         ORDER BY fact_count DESC
         LIMIT 20""")
    val rows = df.collect()
    assert(rows.length === 1) // fixture has one axis/member combination
    assert(rows(0).getAs[Long]("fact_count") === 48L)
  }

  test("fact_periods: WITH carrying derived keys into RETURN aliases") {
    val df = run(
      """MATCH (f:Fact)-[:FACT_HAS_PERIOD]->(p:Period)
         WHERE p.end_date IS NOT NULL
         WITH p.fiscal_year AS year, p.end_date AS period_end, count(f) AS fact_count
         RETURN year AS fiscal_year, period_end AS period_end, fact_count
         ORDER BY year DESC, period_end DESC
         LIMIT 20""")
    val rows = df.collect()
    assert(rows.length === 8) // 8 periods in the fixture
    assert(rows.map(_.getAs[Long]("fact_count")).sum === 400L)
    val years = rows.map(_.getAs[Int]("fiscal_year"))
    assert(years.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("fact_aspects: chained separate OPTIONAL MATCH clauses") {
    val df = run(
      """MATCH (r:Report)-[:REPORT_HAS_FACT]->(f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         OPTIONAL MATCH (f)-[:FACT_HAS_PERIOD]->(p:Period)
         OPTIONAL MATCH (f)-[:FACT_HAS_UNIT]->(u:Unit)
         RETURN r.form AS form, e.name AS element, f.numeric_value AS value,
                p.fiscal_year AS fiscal_year, p.start_date AS period_start,
                u.measure AS unit
         ORDER BY element, period_start
         LIMIT 30""")
    val rows = df.collect()
    assert(rows.length === 30)
    assert(rows.forall(_.getAs[String]("unit") != null)) // every fact has a unit
  }

  test("fact_with_dimensions: mixed MATCH + OPTIONAL MATCH context") {
    val df = run(
      """MATCH (r:Report)-[:REPORT_HAS_FACT]->(f:Fact)-[:FACT_HAS_ELEMENT]->(e:Element)
         MATCH (f)-[:FACT_HAS_DIMENSION]->(fd:FactDimension)
         OPTIONAL MATCH (f)-[:FACT_HAS_PERIOD]->(p:Period)
         RETURN r.period_end_date AS report_date, e.name AS element,
                f.numeric_value AS value, p.fiscal_year AS fiscal_year,
                fd.axis_uri AS dimension_axis, fd.member_uri AS dimension_member
         ORDER BY report_date DESC, element LIMIT 20""")
    val rows = df.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[String]("dimension_axis") === "us-gaap:SegmentAxis"))
  }
}
