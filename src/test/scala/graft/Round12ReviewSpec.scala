package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPipeline, PipelineContext, PipelineQueries}

/** Round-12 review pins: the ADVICE-medium t52 cohort defect (the
  * classifier cutpoint ran over ALL scored docs instead of the joined
  * ppl⋈clf⋈dsir id set — invisible on testdata, divergent on any
  * corpus with sub-bigram docs). */
class Round12ReviewSpec extends SparkTestBase {
  import spark.implicits._

  test("selection-pipeline cuts run over the joined token cohort; sub-bigram docs excluded") {
    // graded "the" density spreads the classifier scores; mixed langs
    // give GD a non-degenerate label column
    val base = (1 to 11).map { i =>
      val thes = Seq.fill(i)("the").mkString(" ")
      (i.toLong, s"$thes alpha$i beta$i", if (i % 3 == 0) "de" else "en")
    }
    // ONE token (no spaces): no bigram → absent from the perplexity
    // signal → absent from the scored cohort. Its engineered-extreme
    // classifier score must therefore NOT move the p40 classifier cut
    // the surviving cohort is compared against.
    val degen = (99L, "thethethethethethethethe", "en")
    val docs = (base :+ degen).toDF("doc_id", "text", "lang")

    val got = PipelineContext.materialize { implicit ctx =>
      PipelineQueries.selectionPipelineOn(docs)
    }.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    // independent replay with the cohort EXPLICIT: all three cuts over
    // the joined id set — the oracle SQL's shape
    val want = PipelineContext.materialize { implicit ctx =>
      val en = col("lang") === "en"
      val toks = CurationPipeline.tokenFrame(docs, "doc_id", "text", en)
      val ppl = CurationPipeline.lmPerplexityFromTokens(toks)
        .select(col("id"), round(col("ppl"), 6).as("ppl"))
      val dsir = CurationPipeline.importanceWeightsFromTokens(toks)
        .select(col("id"), round(col("score"), 6).as("dscore"))
      val feats = CurationPipeline.classifierFeatures(docs, "doc_id", "text", en)
      val w = CurationPipeline.trainQualityClassifierOnFeats(feats).collect()(0)
      val clf = CurationPipeline.scoreFromFeats(feats, (1 to 4).map(w.getDouble))
        .select(col("id"), round(col("score"), 6).as("cs"))
      val joined = ctx.stagePersist(
        ppl.join(dsir, Seq("id")).join(clf, Seq("id")))
      val cuts = joined.agg(
        round(percentile(col("ppl"), lit(0.6)), 6).as("pcut"),
        round(percentile(col("dscore"), lit(0.4)), 6).as("dcut"),
        round(percentile(col("cs"), lit(0.4)), 6).as("ccut")).collect()(0)
      joined.withColumn("bucket",
          when(col("ppl") > lit(cuts.getDouble(0)), "ppl_fail")
            .when(col("cs") < lit(cuts.getDouble(2)), "clf_fail")
            .when(col("dscore") < lit(cuts.getDouble(1)), "dsir_fail")
            .otherwise("kept"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        .orderBy(col("bucket"))
    }.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    assert(got === want)
    // the degenerate doc lands in NO bucket (it has no token signals)
    assert(got.map(_._2).sum === 11L)
    assert(got.map(_._3).sum === (1 to 11).sum.toLong)
  }

  test("s06 corpus appends are idempotent under micro-batch replay") {
    import graft.operators.StreamQueries
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-s06replay").toString + "/corpus"
    val b0 = Seq((0L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (4L, "delta epsilon zeta")).toDF("doc_id", "text")
    val b1 = Seq((1L, "alpha beta gamma"), (3L, "eta theta iota"))
      .toDF("doc_id", "text")
    StreamQueries.corpusDedupAppend(b0, corpusDir, 0L)
    StreamQueries.corpusDedupAppend(b1, corpusDir, 1L)
    def state() = StreamQueries.readCorpus(spark, corpusDir)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val want = state()
    // batch 0: doc 2 is a within-batch exact dup of 0; batch 1: doc 1
    // is an exact dup of the corpus' doc 0, doc 3 survives
    assert(want === Seq(0L, 3L, 4L))
    // an at-least-once REPLAY of either batch is a no-op — without the
    // committed-batch guard, replaying b1 would dedup its docs against
    // their own survivors and replace them with an EMPTY set
    StreamQueries.corpusDedupAppend(b0, corpusDir, 0L)
    StreamQueries.corpusDedupAppend(b1, corpusDir, 1L)
    assert(state() === want)
  }

  // ---- element-mapping view edges (reference element_mapping.py) ----------

  test("element mapping: net_balance fallback, zero-weight guard, groupless aggregation") {
    import graft.views.ElementMapping
    import graft.views.ElementMapping.Association
    // trial-balance shape: net_balance (no numeric_value), NO group-by
    // candidates -> one row per target over all facts
    val tb = Seq(
      ("e1", 10.0), ("e1", 30.0), ("e2", 5.0)).toDF("element_id", "net_balance")
    val out = ElementMapping(tb, Seq(
      Association("a1", "e1", "t:Zero", "weighted_average", weight = 0.0),
      Association("a2", "e2", "t:Sum", "sum")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    // Σw = 0 -> 0.0 (py:204), not a NaN; value column keeps its name
    assert(out.toSeq === Seq(("t:Sum", "Sum", 5.0), ("t:Zero", "Zero", 0.0)))

    // mixed-method target dispatches the SMALLEST order_value's method
    val facts = Seq(("x", 1.0), ("x", 2.0), ("y", 30.0))
      .toDF("element_id", "net_balance")
    val mixed = ElementMapping(facts, Seq(
      Association("b2", "y", "t:M", "sum", orderValue = 2.0),
      Association("b1", "x", "t:M", "average", orderValue = 1.0)))
      .collect().map(_.getDouble(2))
    assert(mixed.toSeq === Seq(11.0)) // avg(1,2,30), not sum

    // empty associations: the facts pass through unchanged (py:101)
    assert(ElementMapping(facts, Nil).collect().length === 3)
  }
}
