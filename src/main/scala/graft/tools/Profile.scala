package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: split per-query wall time into plan construction+analysis
  * vs execution, for targeted optimization. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.Profile q23_count_distinct c05_...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkBoot.session(cpus.toInt, "ERROR")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // warmup
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    println(f"${"query"}%-26s constr  analyz  exec    total")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      println(f"$n%-26s ${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f ${(t3 - t2) / 1e9}%7.3f ${(t3 - t0) / 1e9}%7.3f")
    }
    spark.stop()
  }
}
