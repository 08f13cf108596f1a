package graft

import graft.operators.RelationalQueries

/** Smoke + shape checks per relational operator. Value-level equality
  * against DuckDB runs via scripts/check.py (the driver's protocol);
  * these tests pin row counts / invariants that must hold at any SF. */
class RelationalQueriesSpec extends SparkTestBase {

  test("every query runs and returns a non-empty schema") {
    RelationalQueries.all.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }

  test("oracle map covers every query") {
    val missing = RelationalQueries.all.keySet -- RelationalQueries.oracle.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q01 groups by returnflag+linestatus") {
    val rows = RelationalQueries.q01PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q05 optional match keeps all customers") {
    val total = graft.sources.Tables.customer(spark, sfDir).count()
    val got = RelationalQueries.q05OptionalMatch(spark, sfDir).count()
    assert(got === total)
  }

  test("q06 anti + complementary semi partition the customer set") {
    val c = graft.sources.Tables.customer(spark, sfDir)
    val o = graft.sources.Tables.orders(spark, sfDir)
      .filter(o => o.getAs[String]("o_orderstatus") == "P")
    val anti = RelationalQueries.q06AntiJoin(spark, sfDir).count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi === c.count())
  }

  test("q09 topk is sorted desc") {
    val vals = RelationalQueries.q09TopK(spark, sfDir)
      .collect().map(_.getAs[Double]("totalprice"))
    assert(vals.length === 20)
    assert(vals.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q12 window dedup keeps one row per orderkey") {
    val firstLines = RelationalQueries.q12WindowDedup(spark, sfDir)
      .collect()(0).getAs[Long]("first_lines")
    val orders = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    assert(firstLines === orders)
  }

  test("q13 self join emits unordered pairs once") {
    val rows = RelationalQueries.q13SelfJoin(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[String]("nation1") < r.getAs[String]("nation2")))
  }

  test("q17 pivot has one row per priority with status columns") {
    val df = RelationalQueries.q17Pivot(spark, sfDir)
    assert(df.columns.toSet === Set("o_orderpriority", "F", "O", "P"))
    assert(df.count() === 5)
  }
}
