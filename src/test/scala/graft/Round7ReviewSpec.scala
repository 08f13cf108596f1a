package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalQueries

/** Round-7 additions beyond the driver gates: the approximate-distinct
  * opt-in and the plan properties that justify it. */
class Round7ReviewSpec extends SparkTestBase {

  test("q23 approx variant tracks the exact counts within the HLL rsd bound") {
    val exact = RelationalQueries.q23CountDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = RelationalQueries.q23CountDistinctApprox(spark, sfDir, rsd = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (nOrd, nPs, nRows)) =>
      val (aOrd, aPs, aRows) = approx(flag)
      // n_rows is exact in both forms
      assert(aRows === nRows, s"$flag n_rows")
      // HLL++ with rsd=0.05: allow 4 sigma (=20%) so the test never
      // flakes; observed error is far smaller
      assert(math.abs(aOrd - nOrd).toDouble / nOrd < 0.2, s"$flag n_orders $aOrd vs $nOrd")
      assert(math.abs(aPs - nPs).toDouble / nPs < 0.2, s"$flag n_part_supp $aPs vs $nPs")
    }
  }

  test("q23 approx plan exchanges sketches, not keys: no expand, single agg pair per branch") {
    val plan = RelationalQueries.q23CountDistinctApprox(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // one partial/final HashAggregate pair around ONE exchange — the
    // sketch merges map-side; no per-key distinct shuffle, no Expand
    assert(!plan.contains("Expand"), s"Expand in approx plan:\n$plan")
    assert(plan.contains("partial_approx_count_distinct"),
      s"no partial sketch aggregation in:\n$plan")
    val exchanges = plan.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*"""))
    assert(exchanges <= 2, s"approx form should need at most agg+sort exchanges:\n$plan")
  }
}
