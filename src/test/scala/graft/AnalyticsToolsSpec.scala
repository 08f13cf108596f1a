package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.{AccountingFixture, SecFixture}
import graft.functions.FinancialAggregators._
import graft.serve.AnalyticsTools

class AnalyticsToolsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val store =
    SecFixture.ingest(spark, Files.createTempDirectory("graft-tools").toString)

  test("schema discovery lists node and rel tables with columns") {
    val rows = AnalyticsTools.describeSchema(store).collect()
    val byName = rows.map(r => r.getString(1) -> r).toMap
    assert(byName("Fact").getString(0) === "node")
    assert(byName("Fact").getString(2) === "identifier")
    assert(byName("FACT_HAS_ELEMENT").getString(2) === "Fact->Element")
    assert(byName("FACT_HAS_ELEMENT").getString(3).startsWith("src,dst"))
  }

  test("fact type breakdown counts numeric facts") {
    val r = AnalyticsTools.factTypeBreakdown(store).collect()(0)
    assert(r.getAs[Long]("total_facts") === 400L)
    assert(r.getAs[Long]("numeric_facts") === 400L)
    assert(r.getAs[Long]("textblock_facts") === 0L)
  }

  test("dimensional patterns separate dimensioned and plain facts") {
    val rows = AnalyticsTools.dimensionalPatterns(store, limit = 100).collect()
    val dimmed = rows.filter(_.getAs[String]("dim_type") != null)
    val plain = rows.filter(_.getAs[String]("dim_type") == null)
    assert(dimmed.map(_.getAs[Long]("fact_count")).sum === 48L)
    assert(plain.map(_.getAs[Long]("fact_count")).sum === 352L)
    // element filter narrows
    val one = AnalyticsTools.dimensionalPatterns(store, Some("us-gaap:Elem0"))
      .collect()
    assert(one.forall(_.getAs[String]("element") === "us-gaap:Elem0"))
  }

  test("aspect combinations count distinct periods/units per element") {
    val rows = AnalyticsTools.aspectCombinations(store, limit = 5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("periods") > 0))
    assert(rows.forall(_.getAs[Long]("units") === 1L)) // one unit per element in fixture
  }

  test("temporal coverage spans the fixture's fiscal periods") {
    val rows = AnalyticsTools.temporalCoverage(store).collect()
    assert(rows.map(_.getAs[Int]("fiscal_year")).distinct.sorted.toSeq === Seq(2023, 2024))
    assert(rows.map(_.getAs[Long]("fact_count")).sum === 400L)
  }

  test("NetBalance aggregator matches the trial-balance arithmetic") {
    val root = Files.createTempDirectory("graft-aggr").toString
    val acct = AccountingFixture.ingest(spark, root, "agg")
    val items = acct.node("LineItem")
      .select(col("debit_amount").as("debit"), col("credit_amount").as("credit"))
      .as[DebitCredit]
    val r = items.select(NetBalance.toColumn).collect()(0)
    assert(math.abs(r.totalDebits - AccountingFixture.expectedTotal) < 1e-6)
    assert(math.abs(r.totalCredits - AccountingFixture.expectedTotal) < 1e-6)
    assert(math.abs(r.netBalance) < 1e-6)
  }

  test("WeightedSum aggregator applies calculation-arc weights") {
    val r = Seq(Weighted(1.0, 100.0), Weighted(-1.0, 30.0), Weighted(1.0, 5.0))
      .toDS().select(WeightedSum.toColumn).collect()(0)
    assert(r === 75.0)
  }
}
