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
