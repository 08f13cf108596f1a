package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, PipelineContext}
import graft.sources.Tables

/** Dev scratch: stage-by-stage walls for t52 (selection pipeline). */
object T52Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val docs = Tables.documents(spark, sfDir)
    val en = col("lang") === "en"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 3).foreach { it =>
      println(s"--- iteration $it")
      PipelineContext.run { implicit ctx =>
        val toks = CurationPipeline.tokenFrame(docs, "doc_id", "text", en)
        t("toks count") { toks.count() }
        val ppl = CurationPipeline.lmPerplexityFromTokens(toks)
          .select(col("id"), round(col("ppl"), 6).as("ppl"))
        t("ppl (noop)") { ppl.write.mode("overwrite").format("noop").save() }
        val dsir = CurationPipeline.importanceWeightsFromTokens(toks)
          .select(col("id"), round(col("score"), 6).as("dscore"))
        t("dsir (noop)") { dsir.write.mode("overwrite").format("noop").save() }
        val pd = ctx.stagePersist(ppl.join(dsir, Seq("id")))
        t("pd count (re-plan)") { pd.count() }
        val wRow = t("train") {
          CurationPipeline.trainQualityClassifier(
            docs, "doc_id", "text", en).collect()(0)
        }
        val clf = CurationPipeline.qualityClassifierScore(
          docs, "doc_id", "text", (1 to 4).map(wRow.getDouble))
          .select(col("id"), round(col("score"), 6).as("cs"))
        val joined = pd.join(clf, Seq("id"))
        t("final bucket agg") {
          val cuts = joined.agg(
            round(percentile(col("ppl"), lit(0.6)), 6).as("pcut"),
            round(percentile(col("cs"), lit(0.4)), 6).as("ccut"),
            round(percentile(col("dscore"), lit(0.4)), 6).as("dcut"))
          joined.crossJoin(broadcast(cuts))
            .withColumn("bucket",
              when(col("ppl") > col("pcut"), "ppl_fail")
                .when(col("cs") < col("ccut"), "clf_fail")
                .when(col("dscore") < col("dcut"), "dsir_fail")
                .otherwise("kept"))
            .groupBy(col("bucket"))
            .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
            .orderBy(col("bucket")).collect()
        }
      }
      t("full gate") {
        graft.operators.PipelineQueries.t52SelectionPipeline(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
