package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.RoboledgerSchema
import graft.storage.GraphStore

/** Deterministic accounting-demo fixture (FIXTURES.md §1, mirroring
  * examples/accounting_demo/03_generate_data.py): one entity, an
  * 18-account chart (reference chart at 03_generate_data.py:162-190),
  * six months of balanced double-entry transactions — every
  * transaction's line items satisfy Σdebit = Σcredit. */
object AccountingFixture {

  val chart: Seq[(String, String, String, String)] = Seq(
    // (code, name, classification, balance)
    ("1000", "Cash", "asset", "debit"),
    ("1100", "Accounts Receivable", "asset", "debit"),
    ("1200", "Inventory", "asset", "debit"),
    ("1500", "Equipment", "asset", "debit"),
    ("1600", "Accumulated Depreciation", "asset", "credit"),
    ("2000", "Accounts Payable", "liability", "credit"),
    ("2100", "Accrued Liabilities", "liability", "credit"),
    ("2500", "Notes Payable", "liability", "credit"),
    ("3000", "Common Stock", "equity", "credit"),
    ("3900", "Retained Earnings", "equity", "credit"),
    ("4000", "Product Revenue", "revenue", "credit"),
    ("4100", "Service Revenue", "revenue", "credit"),
    ("5000", "Cost of Goods Sold", "expense", "debit"),
    ("5100", "Salaries Expense", "expense", "debit"),
    ("5200", "Rent Expense", "expense", "debit"),
    ("5300", "Utilities Expense", "expense", "debit"),
    ("5400", "Depreciation Expense", "expense", "debit"),
    ("5500", "Interest Expense", "expense", "debit"))

  /** Build and ingest the fixture into a GraphStore; returns it.
    * `dupFactor > 0` injects that many duplicate rows per table to
    * exercise window-dedup on load (FIXTURES.md §4). */
  def ingest(spark: SparkSession, root: String, graphId: String = "acct",
      dupFactor: Int = 0): GraphStore = {
    import spark.implicits._
    val store = new GraphStore(spark, root, graphId, RoboledgerSchema.schema)

    def dup[T](xs: Seq[T]): Seq[T] =
      if (dupFactor <= 0) xs else xs ++ xs.take(dupFactor)

    val entity = Seq(("ent1", "Acme Manufacturing", "company", "active"))
      .toDF("identifier", "name", "entity_type", "status")
    store.ingestNodes("Entity", entity, Some("f0"))

    val elements = dup(chart.map { case (code, name, cls, bal) =>
      (s"elem$code", s"uri:$code", s"acct:$code", name, cls, bal, "duration")
    }).toDF("identifier", "uri", "qname", "name", "classification", "balance", "period_type")
    store.ingestNodes("Element", elements, Some("f0"))

    // Six months (2024-01..06), 10 transactions/month, 2 line items
    // each, deterministic pseudo-random amounts.
    val months = (1 to 6).map(m => f"2024-$m%02d")
    case class Txn(id: String, date: String, desc: String, amount: Double,
        debitElem: String, creditElem: String)
    val txns = for {
      (month, mi) <- months.zipWithIndex
      i <- 1 to 10
    } yield {
      val amount = 100.0 + ((mi * 37 + i * 13) % 97) * 25.0
      val (debit, credit) = (i % 5) match {
        case 0 => ("elem1000", "elem4000") // cash sale
        case 1 => ("elem1100", "elem4100") // service on account
        case 2 => ("elem5000", "elem1200") // COGS
        case 3 => ("elem5100", "elem1000") // salaries paid
        case _ => ("elem5200", "elem2000") // rent accrued
      }
      Txn(f"txn$mi$i%02d", s"$month-${10 + i}", s"Transaction $month/$i",
        amount, debit, credit)
    }

    val txnDf = dup(txns).map(t =>
      (t.id, java.sql.Date.valueOf(t.date), t.desc, "journal", t.amount, "USD"))
      .toDF("identifier", "date", "description", "type", "amount", "currency")
    store.ingestNodes("Transaction", txnDf, Some("f0"))

    val lineItems = txns.flatMap { t =>
      Seq(
        (s"${t.id}_d", s"Debit for ${t.desc}", t.amount, 0.0),
        (s"${t.id}_c", s"Credit for ${t.desc}", 0.0, t.amount))
    }
    store.ingestNodes("LineItem",
      dup(lineItems).toDF("identifier", "description", "debit_amount", "credit_amount"),
      Some("f0"))

    store.ingestRels("ENTITY_HAS_TRANSACTION",
      dup(txns.map(t => ("ent1", t.id))).toDF("from", "to"), Some("f0"))
    store.ingestRels("TRANSACTION_HAS_LINE_ITEM",
      dup(txns.flatMap(t => Seq((t.id, s"${t.id}_d"), (t.id, s"${t.id}_c"))))
        .toDF("from", "to"), Some("f0"))
    store.ingestRels("LINE_ITEM_RELATES_TO_ELEMENT",
      dup(txns.flatMap(t => Seq((s"${t.id}_d", t.debitElem), (s"${t.id}_c", t.creditElem))))
        .toDF("from", "to"), Some("f0"))
    store
  }

  /** Expected total debits (== total credits) across the fixture. */
  def expectedTotal: Double =
    (for { mi <- 0 until 6; i <- 1 to 10 }
      yield 100.0 + ((mi * 37 + i * 13) % 97) * 25.0).sum
}
