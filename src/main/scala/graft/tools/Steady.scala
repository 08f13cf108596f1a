package graft.tools

import graft.SparkEntry

/** Dev tool: per-iteration wall times for named queries (steady-state
  * latency, separating JIT/codegen warmup from real per-query cost).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Steady 5 c01_... q01_...
  */
object Steady {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    names.filterNot(SparkEntry.queries.contains) match {
      case Seq() =>
      case bad =>
        val hints = bad.map { b =>
          val near = SparkEntry.queries.keys
            .filter(_.startsWith(b.takeWhile(_ != '_'))).toSeq.sorted
          s"  $b — did you mean: ${near.mkString(", ")}"
        }
        sys.error(s"unknown gate(s):\n${hints.mkString("\n")}")
    }
    names.foreach { n =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-26s " + times.map(t => f"$t%6.3f").mkString(" "))
    }
    spark.stop()
  }
}
