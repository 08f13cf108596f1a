package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, PipelineContext}

/** Stage-by-stage wall breakdown of [[Dedup.jaccardPairsExact]]'s plan
  * on a real corpus — where do the seconds actually go, and which
  * assembly of the same recall-1 pieces is fastest? (diagnostic
  * sibling of [[JaccardRegimes]]; VERDICT r13 #1 follow-through). */
object JexactProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val theta = args.drop(1).headOption.map(_.toDouble).getOrElse(0.4)
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def sizeFilter(c: DataFrame): DataFrame = c
      .filter(col("id1") < col("id2"))
      .filter(least(col("sz1"), col("sz2")).cast("double") + lit(1e-9) >=
        lit(theta) * greatest(col("sz1"), col("sz2")))
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      // Va: committed operator
      time("Va current operator") {
        PipelineContext.run { implicit ctx =>
          Dedup.jaccardPairsExact(docs, "doc_id", "text",
            Dedup.WordGrams(2), theta).count()
        }
      }
      // Vb: sz via join; repart; carry sz through agg; no end joins
      time("Vb join-sz carry-sz repart") {
        PipelineContext.run { implicit ctx =>
          val sh0 = ctx.stage(Dedup.shingleHashes(docs, "doc_id", "text",
            Dedup.WordGrams(2)).distinct())
          val sizes = sh0.groupBy(col("id")).agg(count(lit(1)).as("sz"))
          val sh = sh0.join(sizes, Seq("id"))
          val cand = sizeFilter(
            sh.select(col("h"), col("id").as("id1"), col("sz").as("sz1"))
              .join(sh.select(col("h"), col("id").as("id2"),
                col("sz").as("sz2")), Seq("h")))
          cand.repartition(122, col("id1"), col("id2"))
            .groupBy(col("id1"), col("id2"))
            .agg(count(lit(1)).as("c"), min(col("sz1")).as("sz1"),
              min(col("sz2")).as("sz2"))
            .withColumn("jaccard", col("c").cast("double") /
              (col("sz1") + col("sz2") - col("c")))
            .filter(col("jaccard") >= theta)
            .count()
        }
      }
      // Vc: sz via join; plain groupBy (map-side partial agg dedups
      // pairs 3.5x before exchange since probe side is id-clustered)
      time("Vc join-sz partial-agg") {
        PipelineContext.run { implicit ctx =>
          val sh0 = ctx.stage(Dedup.shingleHashes(docs, "doc_id", "text",
            Dedup.WordGrams(2)).distinct())
          val sizes = sh0.groupBy(col("id")).agg(count(lit(1)).as("sz"))
          val sh = sh0.join(sizes, Seq("id"))
          val cand = sizeFilter(
            sh.select(col("h"), col("id").as("id1"), col("sz").as("sz1"))
              .join(sh.select(col("h"), col("id").as("id2"),
                col("sz").as("sz2")), Seq("h")))
          cand.groupBy(col("id1"), col("id2"))
            .agg(count(lit(1)).as("c"), min(col("sz1")).as("sz1"),
              min(col("sz2")).as("sz2"))
            .withColumn("jaccard", col("c").cast("double") /
              (col("sz1") + col("sz2") - col("c")))
            .filter(col("jaccard") >= theta)
            .count()
        }
      }
      // Vd: like Vc but thin exchange (drop sz before agg, end joins)
      time("Vd thin partial-agg + end joins") {
        PipelineContext.run { implicit ctx =>
          val sh0 = ctx.stage(Dedup.shingleHashes(docs, "doc_id", "text",
            Dedup.WordGrams(2)).distinct())
          val sizes = sh0.groupBy(col("id")).agg(count(lit(1)).as("sz"))
          val sh = sh0.join(sizes, Seq("id"))
          val cand = sizeFilter(
            sh.select(col("h"), col("id").as("id1"), col("sz").as("sz1"))
              .join(sh.select(col("h"), col("id").as("id2"),
                col("sz").as("sz2")), Seq("h")))
            .select(col("id1"), col("id2"))
          cand.groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("c"))
            .join(sizes.withColumnsRenamed(Map("id" -> "id1", "sz" -> "sz1")), Seq("id1"))
            .join(sizes.withColumnsRenamed(Map("id" -> "id2", "sz" -> "sz2")), Seq("id2"))
            .withColumn("jaccard", col("c").cast("double") /
              (col("sz1") + col("sz2") - col("c")))
            .filter(col("jaccard") >= theta)
            .count()
        }
      }
      ()
    }
    spark.stop()
  }
}
