package graft

import java.nio.file.Files
import graft.query.cypher.CypherCompiler
import graft.schema.CustomSchemaJson
import graft.storage.GraphStore

/** The custom-graph demo end-to-end (FIXTURES.md §3): user-supplied
  * JSON schema → dynamic GraphStore → the demo's own query shapes
  * (examples/custom_graph_demo/05_query_graph.py), including the
  * cross-company collaboration self-join with cycle closure. */
class CustomGraphSpec extends SparkTestBase {
  import spark.implicits._

  private val schemaJson =
    """{"name":"custom_demo","version":"1.0",
      "nodes":[
        {"name":"Company","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"name","type":"STRING","is_required":true},
          {"name":"industry","type":"STRING"},
          {"name":"founded_year","type":"INT64"}]},
        {"name":"Project","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"name","type":"STRING","is_required":true},
          {"name":"status","type":"STRING"},
          {"name":"budget","type":"DOUBLE"}]},
        {"name":"Person","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"name","type":"STRING","is_required":true},
          {"name":"age","type":"INT64"},
          {"name":"interests","type":"STRING"}]}],
      "relationships":[
        {"name":"PERSON_WORKS_FOR_COMPANY","from_node":"Person","to_node":"Company",
         "properties":[{"name":"role","type":"STRING"}]},
        {"name":"PERSON_WORKS_ON_PROJECT","from_node":"Person","to_node":"Project",
         "properties":[{"name":"hours_per_week","type":"INT64"}]},
        {"name":"COMPANY_SPONSORS_PROJECT","from_node":"Company","to_node":"Project"}]}"""

  private lazy val store: GraphStore = {
    val root = Files.createTempDirectory("graft-custom").toString
    val s = new GraphStore(spark, root, "demo", CustomSchemaJson.parse(schemaJson))
    s.ingestNodes("Company", Seq(
      ("acme", "Acme", "mfg", 1990L), ("globex", "Globex", "tech", 2001L))
      .toDF("identifier", "name", "industry", "founded_year"))
    s.ingestNodes("Project", Seq(
      ("apollo", "Apollo", "active", 100.0), ("zeus", "Zeus", "done", 50.0))
      .toDF("identifier", "name", "status", "budget"))
    s.ingestNodes("Person", Seq(
      ("alice", "Alice", 34L, "graphs"), ("bob", "Bob", 29L, "spark"),
      ("carol", "Carol", 41L, "spark"), ("dave", "Dave", 25L, "ml"))
      .toDF("identifier", "name", "age", "interests"))
    s.ingestRels("PERSON_WORKS_FOR_COMPANY", Seq(
      ("alice", "acme"), ("bob", "acme"), ("carol", "globex"), ("dave", "globex"))
      .toDF("from", "to"))
    s.ingestRels("PERSON_WORKS_ON_PROJECT", Seq(
      ("alice", "apollo"), ("carol", "apollo"), // cross-company pair
      ("bob", "zeus"), ("dave", "apollo"))      // bob alone; dave same co as carol
      .toDF("from", "to"))
    s
  }

  test("cross-company teams: self-join + cycle closure + dedup predicate") {
    val df = new CypherCompiler(store).run(
      """MATCH (p1:Person)-[:PERSON_WORKS_FOR_COMPANY]->(c1:Company),
               (p2:Person)-[:PERSON_WORKS_FOR_COMPANY]->(c2:Company),
               (p1)-[:PERSON_WORKS_ON_PROJECT]->(proj:Project),
               (p2)-[:PERSON_WORKS_ON_PROJECT]->(proj)
         WHERE p1.identifier < p2.identifier AND c1.identifier <> c2.identifier
         RETURN proj.name AS project,
                c1.name AS company_a, p1.name AS teammate_a,
                c2.name AS company_b, p2.name AS teammate_b
         ORDER BY project, company_a, company_b
         LIMIT 50""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(2), r.getString(4)))
    // apollo has alice(acme) + carol(globex) + dave(globex):
    // cross-company pairs with p1<p2: (alice,carol), (alice,dave)
    assert(rows.toSet === Set(
      ("Apollo", "Alice", "Carol"), ("Apollo", "Alice", "Dave")))
  }

  test("interests aggregation (demo 'interests' query)") {
    val df = new CypherCompiler(store).run(
      """MATCH (p:Person)
         RETURN p.interests AS interest_list, count(*) AS people
         ORDER BY people DESC, interest_list ASC
         LIMIT 20""")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.head === ("spark", 2L))
    assert(rows.length === 3)
  }

  test("graphviz projection (demo 'graphviz' query)") {
    val df = new CypherCompiler(store).run(
      """MATCH (p:Person)-[:PERSON_WORKS_ON_PROJECT]->(proj:Project)
         MATCH (p)-[:PERSON_WORKS_FOR_COMPANY]->(c:Company)
         RETURN p.name AS person, c.name AS company, proj.name AS project
         ORDER BY project, company LIMIT 40""")
    assert(df.count() === 4)
    assert(df.columns.toSeq === Seq("person", "company", "project"))
  }
}
