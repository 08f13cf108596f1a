package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{CurationPipeline, PipelineContext}
import graft.sources.Tables

/** Dev scratch: stage-by-stage walls for t55 (anchored span dedup). */
object T55Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val docs = Tables.documents(spark, sfDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 3).foreach { it =>
      println(s"--- iteration $it")
      t("docs count") { docs.count() }
      val blocksPlan = docs
        .select(col("doc_id").as("id"), explode(
          TextFunctions.anchoredSpanBlocks(col("text"), 12, 8)).as("__blk"))
        .select(col("id"), col("__blk.p").as("pos"), col("__blk.b").as("block"))
      t("blocks (noop)") { blocksPlan.write.mode("overwrite").format("noop").save() }
      t("firstOwner (noop)") {
        blocksPlan.groupBy(col("block"))
          .agg(min(struct(col("id").as("i"), col("pos").as("p"))).as("__first"))
          .write.mode("overwrite").format("noop").save()
      }
      t("full op (noop)") {
        PipelineContext.run { implicit ctx =>
          CurationPipeline.dedupSpansAnchored(docs, "doc_id", "text", 12, 8)
            .write.mode("overwrite").format("noop").save()
        }
      }
      t("full gate (materialize+sort)") {
        graft.operators.PipelineQueries.t55SubstrDedup(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
