package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, Dedup, PipelineContext}
import graft.sources.Tables

/** Dev tool: wall-time breakdown of the dedup/curation pipelines —
  * times each staged sub-computation by forcing it with a count, so
  * the per-stage cost is visible instead of lumped into one collect. */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkBoot.session(cpus.toInt, "ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm page cache

    // which planning phase costs: analyze / optimize / physical / toRdd
    (1 to 2).foreach { pass =>
      println(s"== sigs planning phases pass $pass ==")
      PipelineContext.run { implicit ctx =>
        import graft.functions.SketchFunctions
        val hashes = time("hashes stage") {
          ctx.stage(docs
            .select(col("doc_id").as("id"),
              split(lower(trim(col("text"))), "\\s+").as("w"))
            .filter(size(col("w")) >= 2)
            .select(col("id"),
              explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
            .select(col("id"),
              xxhash64(concat_ws(" ", slice(col("w"), col("i"), lit(2)))).as("h")))
        }
        val sigsDf = hashes.groupBy(col("id"))
          .agg(SketchFunctions.minhashSig(col("h"), 64).as("sig"))
        time("sigs analyzed")(sigsDf.queryExecution.analyzed)
        time("sigs optimized")(sigsDf.queryExecution.optimizedPlan)
        time("sigs executedPlan")(sigsDf.queryExecution.executedPlan)
        time("sigs toRdd")(sigsDf.queryExecution.toRdd)
        time("sigs checkpoint call")(ctx.stage(sigsDf))
      }
    }

    // mirror of minhashPairs' internals with per-stage timing
    (1 to 2).foreach { pass =>
      println(s"== t05 stage breakdown pass $pass ==")
      PipelineContext.run { implicit ctx =>
        import graft.functions.SketchFunctions
        import org.apache.spark.sql.expressions.Window
        val (numHashes, bands, j, maxBucket) = (64, 16, 0.4, 500)
        val rows = numHashes / bands
        val hashes = time("stage hashes (shingles)") {
          ctx.stage(docs
            .select(col("doc_id").as("id"),
              split(lower(trim(col("text"))), "\\s+").as("w"))
            .filter(size(col("w")) >= 2)
            .select(col("id"),
              explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
            .select(col("id"),
              xxhash64(concat_ws(" ", slice(col("w"), col("i"), lit(2)))).as("h")))
        }
        val sigs = time("stage sigs (minhash agg)") {
          ctx.stage(hashes.groupBy(col("id"))
            .agg(SketchFunctions.minhashSig(col("h"), numHashes).as("sig")))
        }
        val cand = time("plan banding+selfjoin") {
          val banded = sigs.select(col("id"),
            explode(array((0 until bands).map(b =>
              struct(lit(b).as("band"),
                xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*)).as("bb"))
            .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
          val sized = banded.withColumn("bn",
            count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
            .filter(col("bn") <= maxBucket)
          val a = sized.select(col("band"), col("bh"), col("id").as("id1"))
          val b = sized.select(col("band"), col("bh"), col("id").as("id2"))
          a.join(b, Seq("band", "bh")).filter(col("id1") < col("id2"))
            .select("id1", "id2").distinct()
        }
        val estimated = time("stage estimated (sig est join)") {
          val estMargin = 2.0 * math.sqrt(j * (1 - j) / numHashes)
          val sig1 = sigs.withColumnsRenamed(Map("id" -> "id1", "sig" -> "sig1"))
          val sig2 = sigs.withColumnsRenamed(Map("id" -> "id2", "sig" -> "sig2"))
          ctx.stage(cand
            .join(sig1, Seq("id1")).join(sig2, Seq("id2"))
            .withColumn("est",
              SketchFunctions.matchCount(col("sig1"), col("sig2")).cast("double") / numHashes)
            .filter(col("est") >= j - estMargin)
            .select("id1", "id2"))
        }
        val out = time("plan exact verify") {
          val survivorIds = estimated.select(col("id1").as("id"))
            .union(estimated.select(col("id2").as("id"))).distinct()
          val sh = hashes.join(survivorIds, Seq("id"), "left_semi")
            .groupBy(col("id")).agg(collect_set(col("h")).as("shingles"))
          estimated
            .join(sh.withColumnsRenamed(Map("id" -> "id1", "shingles" -> "sh1")), Seq("id1"))
            .join(sh.withColumnsRenamed(Map("id" -> "id2", "shingles" -> "sh2")), Seq("id2"))
            .withColumn("jaccard",
              size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
                size(array_union(col("sh1"), col("sh2"))))
            .filter(col("jaccard") >= j)
            .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        }
        time("collect")(out.orderBy("id1", "id2").collect().length)
      }
    }

    (1 to 2).foreach { pass =>
      println(s"== t05 pass $pass ==")
      PipelineContext.run { implicit ctx =>
        val t0 = System.nanoTime()
        val pairs = time("build (plan+checkpoint-plan)") {
          Dedup.minhashPairs(docs, "doc_id", "text",
            shingle = Dedup.WordGrams(2), numHashes = 64, bands = 16,
            minJaccard = Some(0.4))
        }
        time("execute collect")(pairs.orderBy("id1", "id2").collect().length)
        println(f"  total t05: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    (1 to 2).foreach { pass =>
      println(s"== t13 pass $pass ==")
      PipelineContext.run { implicit ctx =>
        val t0 = System.nanoTime()
        val (kept, dropped) = time("build") {
          CurationPipeline.curateWithAudit(docs, "doc_id", "text",
            CurationPipeline.Config())
        }
        time("execute agg collect") {
          kept.agg(count(lit(1))).collect()
          dropped.groupBy("drop_reason").count().collect()
        }
        println(f"  total t13: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
  }
}
