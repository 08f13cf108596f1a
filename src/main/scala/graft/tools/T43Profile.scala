package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.PipelineContext
import graft.sources.Tables

/** Dev tool: wall-time breakdown of the bloom-decontamination gate
  * (t43) — times the bench-side actions (persist/count/bloom build)
  * separately from the corpus-side probe join, across repeated passes
  * so steady-state cost is visible. */
object T43Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val n = 4
    (1 to 3).foreach { pass =>
      println(s"== t43 breakdown pass $pass ==")
      PipelineContext.run { implicit ctx =>
        val bench = docs.filter(col("doc_id") % 10 === 0)
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val benchGrams = time("benchGrams persist") {
          ctx.stagePersist(
            bench.select(explode(TextFunctions.wordShingles(col("text"), n)).as("g"))
              .distinct()
              .withColumn("__hit", lit(1)))
        }
        val items = time("benchGrams count")(math.max(benchGrams.count(), 1024L))
        val bits = math.min(items * 10L, 67108864L)
        val bloomRow = time("bloom agg head") {
          benchGrams.agg(graft.functions.SketchFunctions.bloomAgg(
            xxhash64(col("g")), items, bits).as("bf")).head()
        }
        time("tokens only")(corpus.select(size(TextFunctions.tokens(col("text"))))
          .write.mode("overwrite").format("noop").save())
        time("shingle no-distinct")(corpus.select(size(transform(
            sequence(lit(0), greatest(size(TextFunctions.tokens(col("text"))) - n, lit(0))),
            i => concat_ws(" ", slice(TextFunctions.tokens(col("text")), i + 1, lit(n))))))
          .write.mode("overwrite").format("noop").save())
        time("shingle size only")(corpus.select(
            size(TextFunctions.wordShingles(col("text"), n)))
          .write.mode("overwrite").format("noop").save())
        time("explode shingles (t24 shape)")(corpus.select(col("doc_id"),
            explode(TextFunctions.wordShingles(col("text"), n)).as("g"))
          .write.mode("overwrite").format("noop").save())
        val denom = corpus
          .select(col("doc_id").as("id"),
            size(TextFunctions.wordShingles(col("text"), n)).cast("long").as("__sz"))
          .groupBy(col("id")).agg(sum(col("__sz")).as("n_grams"))
        time("denom only")(denom.write.mode("overwrite").format("noop").save())
        val flagged = corpus
          .select(col("doc_id").as("id"),
            explode(TextFunctions.wordShingles(col("text"), n)).as("g"))
          .filter(graft.functions.SketchFunctions.mightContain(
            lit(bloomRow.getAs[Array[Byte]](0)), xxhash64(col("g"))))
        val hits = flagged.join(benchGrams.select("g"), Seq("g"), "left_semi")
          .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
        time("hits only")(hits.write.mode("overwrite").format("noop").save())
        val full = denom.join(hits, Seq("id"), "left")
          .select(col("id"), col("n_grams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("containment",
            round(col("n_hits").cast("double") / col("n_grams"), 6))
          .orderBy(col("id"))
        time("full query")(full.write.mode("overwrite").format("noop").save())
        time("full collect (gate shape)")(full.collect())
      }
    }
    spark.stop()
  }
}
