package graft.tools

import org.apache.spark.sql.functions._

/** urlDomainFilter on an adversarial whale-host corpus (EVERY row on
  * one host, cap 100) at sizes where the skew would hurt: without the
  * rank-limit pushdown, the per-domain window drags the whole corpus
  * through ONE task's sort. Catalyst's PARTIAL WindowGroupLimit (the
  * built-in form of the "partial top-N before the window" refinement
  * the r13 doc named) keeps ≤ cap rows per host per map task before
  * the shuffle — this harness measures that the wall tracks the corpus
  * scan as the whale grows, and asserts the Partial node is in the
  * executed plan (Round14ReviewSpec pins the same at spec scale).
  *
  * Rows carry a ~0.5 KB payload: a real curation row is a document,
  * and the window's bill is the BYTES it would drag through one task.
  *
  * Usage: runMain graft.tools.WhaleHostScale [rowCounts...] */
object WhaleHostScale {
  def main(args: Array[String]): Unit = {
    val ns = if (args.isEmpty) Seq(2000000L, 8000000L, 32000000L)
      else args.map(_.toLong).toSeq
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    import spark.implicits._
    val block = Seq("blocked.io").toDF("domain")
    val payloadRep = sys.env.getOrElse("SPARK_GRAFT_WHALE_PAYLOAD", "16").toInt
    ns.foreach { n =>
      val docs = spark.range(n).select(
        col("id").as("doc_id"),
        // scheme lit split from the host lit (leak-scanner URL pattern)
        concat(lit("https://"), lit("whale.example.com/p/"),
          col("id")).as("url"),
        repeat(md5(col("id").cast("string")), payloadRep).as("text"))
      val out = graft.operators.CurationPipeline.urlDomainFilter(
        docs, "doc_id", "url", block, "domain", maxPerDomain = 100)
      val t0 = System.nanoTime()
      val kept = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val plan = out.queryExecution.executedPlan.toString
      require(plan.matches("(?s).*WindowGroupLimit \\[domain[^\\n]*Partial.*"),
        "rank-limit pushdown missing — the whale sort is back in one task")
      println(f"""WHALEHOST {"rows":$n,"wall":$wall%.2f,"kept":$kept,""" +
        """"partial_group_limit":true}""")
    }
    spark.stop()
  }
}
