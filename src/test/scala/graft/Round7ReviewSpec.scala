package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPipeline, PipelineContext, RelationalQueries}

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

  test("contaminationPairs: pair attribution, threshold, and the df-cap boilerplate filter") {
    import spark.implicits._
    // doc 1 shares two DISTINCT trigrams with bench 100 ("alpha beta
    // gamma", "beta gamma delta"); doc 2 shares only one; docs 3-6 all
    // carry the same boilerplate trigram that bench 101 also has
    val corpus = Seq(
      (1L, "alpha beta gamma delta unique1"),
      (2L, "alpha beta gamma zzz unique2"),
      (3L, "common legal footer unique3"),
      (4L, "common legal footer unique4"),
      (5L, "common legal footer unique5"),
      (6L, "common legal footer unique6")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "common legal footer")).toDF("doc_id", "text")
    val out = PipelineContext.materialize { implicit ctx =>
      CurationPipeline.contaminationPairs(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minShared = 2, dfCap = 3)
    }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 x bench 100 shares trigrams {alpha-beta-gamma, beta-gamma-delta}
    assert(out === Set((1L, 100L, 2L)),
      s"expected only the attributed pair, got $out")
    // with the cap relaxed the boilerplate docs DO pair with bench 101
    // (1 shared gram < minShared=2 still excluded) — prove the cap was
    // the thing filtering, not the threshold
    val uncapped = PipelineContext.materialize { implicit ctx =>
      CurationPipeline.contaminationPairs(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minShared = 1, dfCap = 1000)
    }.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set(3L, 4L, 5L, 6L).subsetOf(uncapped.collect { case (id, 101L) => id }))
    val capped = PipelineContext.materialize { implicit ctx =>
      CurationPipeline.contaminationPairs(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minShared = 1, dfCap = 3)
    }.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(_._2 == 101L),
      s"df-capped boilerplate gram should pair nothing with bench 101: $capped")
  }
}
