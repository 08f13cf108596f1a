package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PipelineContext}

/** Regime duel for the Jaccard engine family: times
  * [[Dedup.jaccardPairsExact]] vs [[Dedup.jaccardPairsPrefix]] on the
  * sf0.1 documents corpus across thresholds — the measurement behind
  * [[Dedup.jaccardRouteFor]]'s Exact/Prefix boundary. Re-run whenever
  * either engine changes shape (the round-13 PPJoin upgrade moved the
  * boundary: the old one-sided prefix filter only paid at θ ≥ ~0.65,
  * the two-sided + positional stack cuts candidates quadratically in
  * prefix selectivity and pays much earlier).
  *
  * Usage: runMain graft.tools.JaccardRegimes [sfDir] [passes]
  */
object JaccardRegimes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(thresh: Double, prefix: Boolean): (Double, Long) = {
      var rows = 0L
      val walls = (1 to passes).map { _ =>
        time {
          rows = PipelineContext.run { implicit ctx =>
            val pairs =
              if (prefix) Dedup.jaccardPairsPrefix(
                docs, "doc_id", "text", Dedup.WordGrams(2), thresh)
              else Dedup.jaccardPairsExact(
                docs, "doc_id", "text", Dedup.WordGrams(2), thresh)
            pairs.count()
          }
        }
      }
      (walls.min, rows)
    }
    println(f"${"theta"}%6s ${"exact_s"}%8s ${"prefix_s"}%9s ${"pairs"}%8s")
    Seq(0.3, 0.4, 0.5, 0.6, 0.7).foreach { t =>
      // warmups interleave naturally across thresholds; per-config min
      // over `passes` runs is the steady wall
      val (we, ne) = best(t, prefix = false)
      val (wp, np) = best(t, prefix = true)
      require(ne == np, s"engines disagree at theta=$t: $ne vs $np")
      println(f"$t%6.2f $we%8.2f $wp%9.2f $ne%8d")
    }
    spark.stop()
  }
}
