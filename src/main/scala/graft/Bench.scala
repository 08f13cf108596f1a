package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every SparkEntry
  * query on SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology: one untimed warmup pass (JIT + codegen caches + OS
  * page cache — steady-state latency is what a long-lived Spark
  * service serves), then two FULL timed passes with the per-query best
  * kept. Whole-suite passes (rather than back-to-back repeats of each
  * query) separate a query's two samples by minutes, so a transient
  * load spike early in the run inflates at most one sample of each
  * query instead of both samples of the unlucky first few — round-4's
  * driver run recorded 3-5× on exactly the first six (alphabetical)
  * queries from this. Queries materialize through the `noop` sink so
  * every output column is computed (a bare `count()` would let
  * Catalyst prune the plan). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkBoot.session(cpus.toInt, "ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup pass (untimed)
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    val results = names.map { n =>
      val (a, b) = (pass1(n), pass2(n))
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
