package graft

import java.nio.file.Files
import graft.fixtures.AccountingFixture
import graft.query.cypher.{CypherCompiler, CypherParser}
import graft.storage.GraphStore

/** The Cypher front end against the accounting fixture — queries taken
  * from the reference's own corpus shapes (trial_balance.py,
  * accounting_demo/05_query_graph.py, metrics_service.py). */
class CypherSpec extends SparkTestBase {

  private lazy val root = Files.createTempDirectory("graft-cypher").toString
  private lazy val store: GraphStore =
    AccountingFixture.ingest(spark, root, "cy", dupFactor = 0)
  private def run(q: String, params: Map[String, Any] = Map.empty) =
    new CypherCompiler(store, params).run(q)

  test("parser rejects out-of-subset syntax with a position") {
    assert(CypherParser.parseQuery("FOREACH (x IN [1] | SET x.y = 1)").isLeft)
    assert(CypherParser.parseQuery("MATCH (n) RETURN").isLeft)
  }

  test("single hop with property filter and parameters") {
    val df = run(
      """MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WHERE e.identifier = $entity AND t.amount > $min
         RETURN t.identifier AS id, t.amount AS amount
         ORDER BY amount DESC, id LIMIT 5""",
      Map("entity" -> "ent1", "min" -> 500.0))
    val rows = df.collect()
    assert(rows.length === 5)
    val amounts = rows.map(_.getAs[Double]("amount"))
    assert(amounts.sliding(2).forall(p => p(0) >= p(1)))
    assert(amounts.forall(_ > 500.0))
  }

  test("trial balance via raw Cypher matches the view") {
    val cy = run(
      """MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
               -[:TRANSACTION_HAS_LINE_ITEM]->(li:LineItem)
               -[:LINE_ITEM_RELATES_TO_ELEMENT]->(elem:Element)
         WITH elem,
              sum(li.debit_amount) AS total_debits,
              sum(li.credit_amount) AS total_credits
         RETURN elem.identifier AS element_id,
                elem.name AS element_name,
                total_debits, total_credits,
                total_debits - total_credits AS net_balance
         ORDER BY elem.name""")
    val view = graft.views.TrialBalance(store, "2024-01-01", "2024-12-31")
      .select("element_id", "element_name", "total_debits", "total_credits", "net_balance")
    val a = cy.collect().map(_.toSeq).toSeq
    val b = view.collect().map(_.toSeq).toSeq
    assert(a === b)
    val debits = cy.collect().map(_.getAs[Double]("total_debits")).sum
    assert(math.abs(debits - AccountingFixture.expectedTotal) < 1e-6)
  }

  test("implicit grouping with CASE WHEN and month bucketing (accounting demo)") {
    val df = run(
      """MATCH (t:Transaction)-[:TRANSACTION_HAS_LINE_ITEM]->(li:LineItem)
         RETURN substring(toString(t.date), 1, 7) AS month,
                sum(li.debit_amount) AS debits,
                count(li) AS n
         ORDER BY month""")
    val rows = df.collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[String]("month")).toSeq ===
      (1 to 6).map(m => f"2024-$m%02d"))
    assert(math.abs(rows.map(_.getAs[Double]("debits")).sum
      - AccountingFixture.expectedTotal) < 1e-6)
  }

  test("OPTIONAL MATCH keeps lonely nodes; IS NULL filters to them") {
    import spark.implicits._
    store.ingestNodes("Entity",
      Seq(("lonely", "No Txn Corp")).toDF("identifier", "name"), Some("cy2"))
    val df = run(
      """MATCH (e:Entity)
         OPTIONAL MATCH (e)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WITH e, count(t) AS n
         WHERE n = 0
         RETURN e.identifier AS id, n""")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("id")).toSet === Set("lonely"))
    assert(rows(0).getAs[Long]("n") === 0L)
  }

  test("RETURN DISTINCT + label introspection") {
    val df = run(
      """MATCH (t:Transaction)
         RETURN DISTINCT label(t) AS lbl, t.currency AS ccy""")
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("lbl") === "Transaction")
    assert(rows(0).getAs[String]("ccy") === "USD")
  }

  test("inline property map filter + count(*) + string predicates") {
    val df = run(
      """MATCH (e:Entity {identifier: 'ent1'})-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WHERE t.description CONTAINS 'Transaction' AND t.identifier STARTS WITH 'txn0'
         RETURN count(*) AS n""")
    assert(df.collect()(0).getAs[Long]("n") === 10L) // month index 0
  }

  test("IN list and arithmetic projection") {
    val df = run(
      """MATCH (li:LineItem)
         WHERE li.debit_amount > 0 AND li.identifier IN ['txn001_d', 'txn002_d', 'nope']
         RETURN li.identifier AS id, li.debit_amount * 2 AS double_debit
         ORDER BY id""")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("id")).toSeq === Seq("txn001_d", "txn002_d"))
  }

  test("relationship property access via rel variable and type()") {
    val df = run(
      """MATCH (e:Entity)-[r:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         RETURN DISTINCT type(r) AS rel_type""")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("ENTITY_HAS_TRANSACTION"))
  }

  test("untyped relationship hop: per-type counts match typed queries (financial agent shape)") {
    val counts = run(
      """MATCH (e:Entity)-[r]->(n)
         RETURN type(r) AS rel_type, count(*) AS cnt
         ORDER BY rel_type""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val typed = run(
      """MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         RETURN count(*) AS cnt""").collect()(0).getLong(0)
    assert(counts("ENTITY_HAS_TRANSACTION") === typed)
    // never-materialized rel types join empty and emit no group
    assert(counts.values.forall(_ > 0))
  }

  test("label-less MATCH (n): per-label counts via node-table union (metrics shape)") {
    val counts = run(
      """MATCH (n) RETURN label(n) AS lbl, count(n) AS cnt ORDER BY lbl""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val entities = run("MATCH (e:Entity) RETURN count(e) AS c").collect()(0).getLong(0)
    val txns = run("MATCH (t:Transaction) RETURN count(t) AS c").collect()(0).getLong(0)
    assert(counts("Entity") === entities)
    assert(counts("Transaction") === txns)
    assert(counts.values.forall(_ > 0))
  }

  test("undirected typed hop equals the schema-consistent orientation") {
    val directed = run(
      """MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         RETURN count(*) AS c""").collect()(0).getLong(0)
    val undirected = run(
      """MATCH (t:Transaction)-[:ENTITY_HAS_TRANSACTION]-(e:Entity)
         RETURN count(*) AS c""").collect()(0).getLong(0)
    assert(directed > 0 && undirected === directed)
  }

  test("undirected self-typed hop yields both bindings per edge") {
    import spark.implicits._
    store.ingestNodes("Entity",
      Seq(("ent2", "Acme Subsidiary")).toDF("identifier", "name"), Some("cy3"))
    store.ingestRels("ENTITY_OWNS_ENTITY",
      Seq(("ent1", "ent2")).toDF("src", "dst"), Some("cy3"))
    val rows = run(
      """MATCH (a:Entity)-[:ENTITY_OWNS_ENTITY]-(b:Entity)
         RETURN a.identifier AS a, b.identifier AS b ORDER BY a""").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("ent1", "ent2"), ("ent2", "ent1")))
  }

  test("anonymous any-rel scan lists materialized rel types (metrics shape)") {
    val types = run(
      """MATCH ()-[r]->() RETURN DISTINCT label(r) AS rel_type ORDER BY rel_type""")
      .collect().map(_.getString(0)).toSet
    assert(types.contains("ENTITY_HAS_TRANSACTION"))
    assert(types.contains("TRANSACTION_HAS_LINE_ITEM"))
    // rel-var predicates resolve on the join-free fast path too
    val n = run("MATCH ()-[r]->() WHERE r IS NOT NULL RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("rel variable IS NULL distinguishes unmatched optional hops") {
    val rows = run(
      """MATCH (e:Entity)
         OPTIONAL MATCH (e)-[r:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WHERE t.amount > 999999999.0
         RETURN e.identifier AS id,
                sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS unmatched,
                count(t) AS matched
         ORDER BY id""").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("unmatched") === 1L && r.getAs[Long]("matched") === 0L))
  }

  test("UNWIND explodes literal lists and parameters; empty list yields no rows") {
    val lit = run("UNWIND [3, 1, 2] AS x RETURN x ORDER BY x")
      .collect().map(_.getLong(0))
    assert(lit.toSeq === Seq(1L, 2L, 3L))
    val param = run(
      """MATCH (e:Entity {identifier: 'ent1'})
         UNWIND $tags AS tag
         RETURN e.identifier AS id, tag ORDER BY tag""",
      Map("tags" -> Seq("a", "b")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(param.toSeq === Seq(("ent1", "a"), ("ent1", "b")))
    assert(run("UNWIND [] AS x RETURN x").collect().isEmpty)
  }

  test("heterogeneous var-length path -[*1..2]-> reaches typed-path labels") {
    val counts = run(
      """MATCH (e:Entity {identifier: 'ent1'})-[*1..2]->(n)
         RETURN label(n) AS lbl, count(*) AS cnt ORDER BY lbl""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val txns = run(
      """MATCH (e:Entity {identifier: 'ent1'})-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         RETURN count(*) AS c""").collect()(0).getLong(0)
    // 1 hop reaches Transaction; 2 hops reach LineItem through them
    assert(counts("Transaction") === txns)
    assert(counts.contains("LineItem"))
  }

  test("statistical aggregates: STDEV and percentileCont compile and agree with DataFrame forms") {
    import org.apache.spark.sql.functions._
    val got = run(
      """MATCH (t:Transaction)
         RETURN round(STDEV(t.amount), 4) AS sd,
                round(percentileCont(t.amount, 0.5), 4) AS med""").collect()(0)
    val exp = store.node("Transaction").agg(
      round(stddev_samp(col("amount")), 4).as("sd"),
      round(percentile(col("amount"), lit(0.5)), 4).as("med")).collect()(0)
    assert(got.getDouble(0) === exp.getDouble(0))
    assert(got.getDouble(1) === exp.getDouble(1))
  }

  test("percentileDisc returns an actual element at the fraction position") {
    import org.apache.spark.sql.functions._
    val got = run(
      """MATCH (t:Transaction)
         RETURN percentileDisc(t.amount, 0.5) AS med,
                percentileDisc(t.amount, 0.0) AS lo,
                percentileDisc(t.amount, 1.0) AS hi""").collect()(0)
    val amounts = store.node("Transaction")
      .select(col("amount")).collect().map(_.getDouble(0)).sorted
    assert(got.getDouble(1) === amounts.head)  // p=0 clamps to first
    assert(got.getDouble(2) === amounts.last)
    assert(got.getDouble(0) ===
      amounts(math.max(math.ceil(0.5 * amounts.length).toInt, 1) - 1))
    assert(amounts.contains(got.getDouble(0))) // discrete: element of the set
  }

  test("SKIP/LIMIT paging is deterministic under ORDER BY") {
    val page1 = run(
      "MATCH (t:Transaction) RETURN t.identifier AS id ORDER BY id LIMIT 3")
      .collect().map(_.getString(0))
    val page2 = run(
      "MATCH (t:Transaction) RETURN t.identifier AS id ORDER BY id SKIP 3 LIMIT 3")
      .collect().map(_.getString(0))
    assert(page1.length === 3 && page2.length === 3)
    assert((page1 ++ page2).toSeq === (page1 ++ page2).sorted.toSeq)
    assert(page1.toSet.intersect(page2.toSet).isEmpty)
  }
}
