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

  // a second store WITH relationship property values, for the sparse
  // supertype rel-property surface on union hops (round-7 addition)
  private lazy val propStore: GraphStore = {
    val root = Files.createTempDirectory("graft-relprops").toString
    val s = new GraphStore(spark, root, "relprops", CustomSchemaJson.parse(schemaJson))
    s.ingestNodes("Company", Seq(("acme", "Acme", "mfg", 1990L))
      .toDF("identifier", "name", "industry", "founded_year"))
    s.ingestNodes("Project", Seq(("apollo", "Apollo", "active", 100.0))
      .toDF("identifier", "name", "status", "budget"))
    s.ingestNodes("Person", Seq(
      ("alice", "Alice", 34L, "graphs"), ("bob", "Bob", 29L, "spark"))
      .toDF("identifier", "name", "age", "interests"))
    s.ingestRels("PERSON_WORKS_FOR_COMPANY", Seq(
      ("alice", "acme", "eng"), ("bob", "acme", "pm"))
      .toDF("from", "to", "role"))
    s.ingestRels("PERSON_WORKS_ON_PROJECT", Seq(
      ("alice", "apollo", 20L), ("bob", "apollo", 10L))
      .toDF("from", "to", "hours_per_week"))
    s
  }

  test("any-rel hop exposes rel properties as sparse supertype columns") {
    val df = new CypherCompiler(propStore).run(
      """MATCH (p:Person)-[r]->(x)
         RETURN p.name AS person, type(r) AS rel,
                r.role AS role, r.hours_per_week AS hours
         ORDER BY person, rel""")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    // role populated only on WORKS_FOR branches, hours only on
    // WORKS_ON branches — null elsewhere (the sparse contract)
    assert(rows === Seq(
      ("Alice", "PERSON_WORKS_FOR_COMPANY", Some("eng"), None),
      ("Alice", "PERSON_WORKS_ON_PROJECT", None, Some(20L)),
      ("Bob", "PERSON_WORKS_FOR_COMPANY", Some("pm"), None),
      ("Bob", "PERSON_WORKS_ON_PROJECT", None, Some(10L))))
  }

  test("rel properties on union hops filter in WHERE") {
    val df = new CypherCompiler(propStore).run(
      """MATCH (p:Person)-[r]->(x)
         WHERE r.hours_per_week > 15
         RETURN p.name AS person, r.hours_per_week AS hours""")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("Alice", 20L)))
  }

  test("any-rel SCAN ()-[r]->() exposes rel properties sparsely") {
    val df = new CypherCompiler(propStore).run(
      """MATCH ()-[r]->()
         RETURN type(r) AS rel, r.role AS role
         ORDER BY rel, role""")
    val rows = df.collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(rows === Seq(
      ("PERSON_WORKS_FOR_COMPANY", Some("eng")),
      ("PERSON_WORKS_FOR_COMPANY", Some("pm")),
      ("PERSON_WORKS_ON_PROJECT", None),
      ("PERSON_WORKS_ON_PROJECT", None)))
  }

  test("same-name rel property with conflicting types widens to string") {
    val root = Files.createTempDirectory("graft-relwide").toString
    val widenJson =
      """{"name":"widen_demo","version":"1.0",
        "nodes":[
          {"name":"N","properties":[
            {"name":"identifier","type":"STRING","is_primary_key":true}]}],
        "relationships":[
          {"name":"A_REL","from_node":"N","to_node":"N",
           "properties":[{"name":"weight","type":"INT64"}]},
          {"name":"B_REL","from_node":"N","to_node":"N",
           "properties":[{"name":"weight","type":"DOUBLE"}]}]}"""
    val s = new GraphStore(spark, root, "widen", CustomSchemaJson.parse(widenJson))
    s.ingestNodes("N", Seq(Tuple1("x"), Tuple1("y")).toDF("identifier"))
    s.ingestRels("A_REL", Seq(("x", "y", 7L)).toDF("from", "to", "weight"))
    s.ingestRels("B_REL", Seq(("x", "y", 2.5)).toDF("from", "to", "weight"))
    val df = new CypherCompiler(s).run(
      """MATCH (a:N)-[r]->(b:N)
         RETURN type(r) AS rel, r.weight AS weight ORDER BY rel""")
    assert(df.schema("weight").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("A_REL", "7"), ("B_REL", "2.5")))
  }

  test("referencing a rel property no candidate type declares fails loudly") {
    val e = intercept[IllegalArgumentException] {
      new CypherCompiler(propStore).run(
        "MATCH (p:Person)-[r]->(x) RETURN r.nonexistent")
    }
    assert(e.getMessage.contains("nonexistent"))
  }
}
