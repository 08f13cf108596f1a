package graft

import java.nio.file.Files
import graft.fixtures.AccountingFixture
import graft.query.cypher.CypherCompiler

/** The accounting_demo query corpus (examples/accounting_demo/
  * 05_query_graph.py) through the Cypher front end — including the
  * double-WITH profitability pipeline and 1-based substring. */
class AccountingDemoCorpusSpec extends SparkTestBase {

  private lazy val store = AccountingFixture.ingest(
    spark, Files.createTempDirectory("graft-acctdemo").toString, "ad")
  private def run(q: String) = new CypherCompiler(store).run(q)

  test("profitability: two chained WITH stages with CASE aggregation") {
    val df = run(
      """MATCH (t:Transaction)-[:TRANSACTION_HAS_LINE_ITEM]->(li:LineItem)
               -[:LINE_ITEM_RELATES_TO_ELEMENT]->(e:Element)
         WHERE e.classification IN ['revenue', 'expense']
         WITH substring(toString(t.date), 1, 7) AS month,
              e.classification AS type,
              li.credit_amount AS credit,
              li.debit_amount AS debit
         WITH month,
              sum(CASE WHEN type = 'revenue' THEN credit ELSE 0 END) AS revenue,
              sum(CASE WHEN type = 'expense' THEN debit ELSE 0 END) AS expenses
         RETURN month, revenue, expenses, revenue - expenses AS profit
         ORDER BY month""")
    val rows = df.collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("profit") ===
        r.getAs[Double]("revenue") - r.getAs[Double]("expenses"))
    }
    assert(rows.map(_.getAs[String]("month")).toSeq ===
      (1 to 6).map(m => f"2024-$m%02d"))
  }

  test("top_expenses: WITH aggregation then ordered RETURN with LIMIT") {
    val df = run(
      """MATCH (li:LineItem)-[:LINE_ITEM_RELATES_TO_ELEMENT]->(e:Element)
         WHERE e.classification = 'expense'
         WITH e.name AS expense_account,
              sum(li.debit_amount) AS total_amount,
              count(li) AS transaction_count
         RETURN expense_account, total_amount, transaction_count
         ORDER BY total_amount DESC
         LIMIT 10""")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val totals = rows.map(_.getAs[Double]("total_amount"))
    assert(totals.sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.forall(_.getAs[Long]("transaction_count") > 0))
  }

  test("recent_transactions: ORDER BY date DESC LIMIT") {
    val df = run(
      """MATCH (t:Transaction)
         RETURN t.identifier AS id, toString(t.date) AS date, t.amount AS amount
         ORDER BY date DESC, id LIMIT 5""")
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[String]("date")).forall(_.startsWith("2024-06")))
  }
}
