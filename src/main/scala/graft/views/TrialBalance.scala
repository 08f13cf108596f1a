package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.PatternQuery
import graft.query.PatternQuery.p
import graft.storage.GraphStore

/** The trial-balance view (robosystems/operations/views/
  * trial_balance.py:37-57): 3-hop pattern Entity→Transaction→LineItem→
  * Element, date-range filter, implicit group by element, debit/credit
  * sums, net balance, ordered by element name. Dates compare as the
  * stored type (the reference stores ISO strings and compares
  * lexicographically — trial_balance.py:40-41; our roboledger schema
  * declares Transaction.date DATE, so both work through the same path). */
object TrialBalance {

  def apply(store: GraphStore, periodStart: String, periodEnd: String,
      entityId: Option[String] = None): DataFrame = {
    val base = PatternQuery.matchNode(store, "e", "Entity")
      .out("ENTITY_HAS_TRANSACTION", "e", "t")
      .out("TRANSACTION_HAS_LINE_ITEM", "t", "li")
      .out("LINE_ITEM_RELATES_TO_ELEMENT", "li", "elem")
    val dated = base.where(
      p("t.date") >= lit(periodStart).cast("date") &&
        p("t.date") <= lit(periodEnd).cast("date"))
    val scoped = entityId.fold(dated)(id => dated.where(p("e.identifier") === id))
    scoped.returning(
      "element_id" -> p("elem.identifier"),
      "element_uri" -> p("elem.uri"),
      "element_name" -> p("elem.name"),
      "element_classification" -> p("elem.classification"),
      "element_balance" -> p("elem.balance"),
      "element_period_type" -> p("elem.period_type"),
      "total_debits" -> sum(p("li.debit_amount")),
      "total_credits" -> sum(p("li.credit_amount")),
      "net_balance" -> (sum(p("li.debit_amount")) - sum(p("li.credit_amount"))))
      .orderBy(col("element_name"))
  }
}
