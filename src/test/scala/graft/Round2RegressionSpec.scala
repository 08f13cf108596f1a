package graft

import org.apache.spark.sql.functions._
import graft.query.PatternQuery
import graft.query.cypher.CypherCompiler
import graft.serve.{QueryGovernance, ResultCache}
import graft.sources.TpchGraph

/** Regressions for the round-1 ADVICE findings. */
class Round2RegressionSpec extends SparkTestBase {

  private lazy val graph = new TpchGraph(spark, sfDir)

  test("outVar leftward 1..1 on a non-self rel binds the FROM endpoint") {
    // (n:Nation)<-[:CUSTOMER_IN_NATION*1..1]-(c) must reach Customers,
    // identically to the plain reversed hop.
    val viaVar = PatternQuery.matchNode(graph, "n", "Nation")
      .outVar("CUSTOMER_IN_NATION", "n", "c", 1, 1, rightward = false)
      .returning(
        "nation" -> PatternQuery.p("n.name"),
        "customers" -> count(PatternQuery.p("c.identifier")))
    val viaHop = PatternQuery.matchNode(graph, "n", "Nation")
      .in("CUSTOMER_IN_NATION", "n", "c")
      .returning(
        "nation" -> PatternQuery.p("n.name"),
        "customers" -> count(PatternQuery.p("c.identifier")))
    val a = viaVar.orderBy("nation").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = viaHop.orderBy("nation").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
    // and the variable is usable as a Customer (its pk/prop columns exist)
    val cols = PatternQuery.matchNode(graph, "n", "Nation")
      .outVar("CUSTOMER_IN_NATION", "n", "c", 1, 1, rightward = false)
      .df.columns
    assert(cols.contains("c__mktsegment"))
  }

  test("Cypher leftward var-length 1..1 equals the plain reversed hop") {
    def run(q: String) = new CypherCompiler(graph).run(q)
    val viaVar = run(
      """MATCH (n:Nation)<-[:CUSTOMER_IN_NATION*1..1]-(c:Customer)
         RETURN n.name AS nation, count(c) AS customers ORDER BY nation""")
    val viaHop = run(
      """MATCH (n:Nation)<-[:CUSTOMER_IN_NATION]-(c:Customer)
         RETURN n.name AS nation, count(c) AS customers ORDER BY nation""")
    assert(viaVar.collect().toSeq === viaHop.collect().toSeq)
  }

  test("undirected relationship pattern compiles as the union of orientations") {
    // round 4 upgraded the round-2 loud rejection to real support:
    // (c:Customer)-[:CUSTOMER_PLACED_ORDER]-(o:Order) has exactly one
    // schema-consistent orientation, so it equals the directed form
    val undirected = new CypherCompiler(graph).run(
      "MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]-(o:Order) RETURN count(o) AS n")
      .collect()(0).getLong(0)
    val directed = new CypherCompiler(graph).run(
      "MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order) RETURN count(o) AS n")
      .collect()(0).getLong(0)
    assert(undirected === directed && directed > 0)
  }

  test("undirected OPTIONAL MATCH is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      new CypherCompiler(graph).run(
        """MATCH (c:Customer)
           OPTIONAL MATCH (c)-[:CUSTOMER_PLACED_ORDER]-(o:Order)
           RETURN count(o) AS n""")
    }
    assert(e.getMessage.contains("undirected"))
  }

  test("cache keys cannot collide across param encodings") {
    val cache = new ResultCache[Int]()
    val k1 = cache.key("g", "RETURN 1", Map("a" -> "1;b=2"))
    val k2 = cache.key("g", "RETURN 1", Map("a" -> "1", "b" -> "2"))
    assert(k1 !== k2)
    val k3 = cache.key("g", "RETURN 1", Map("a" -> "1", "b" -> "2;c=3"))
    val k4 = cache.key("g", "RETURN 1", Map("a" -> "1", "b" -> "2", "c" -> "3"))
    assert(k3 !== k4)
    // graphId/query separators can't bleed either
    assert(cache.key("g|x", "RETURN 1") !== cache.key("g", "x|RETURN 1"))
  }

  test("classify ignores keywords used as aliases, properties, map keys") {
    import QueryGovernance._
    assert(classify("MATCH (c:C) RETURN c.set AS use") === QueryKind.Read)
    assert(classify("MATCH (c:C) WHERE c.update > 1 RETURN c.delete, c.copy") === QueryKind.Read)
    assert(classify("MATCH (c:C {set: 1}) RETURN c") === QueryKind.Read)
    assert(classify("MATCH (c:C) RETURN count(c.merge) AS n ORDER BY n") === QueryKind.Read)
    // genuine clauses still classify
    assert(classify("MATCH (n:X) SET n.x = 1") === QueryKind.Write)
    assert(classify("CREATE (n:X {a: 1})") === QueryKind.Write)
    assert(classify("MATCH (n:X) DETACH DELETE n") === QueryKind.Write)
    assert(classify("MATCH (n) WITH n DELETE n") === QueryKind.Write)
    assert(classify("COPY t FROM 'f.parquet'") === QueryKind.Bulk)
    assert(classify("ATTACH 'x.duckdb' AS d") === QueryKind.Admin)
    assert(classify("CREATE NODE TABLE T(id STRING, PRIMARY KEY(id))") === QueryKind.Ddl)
  }
}
