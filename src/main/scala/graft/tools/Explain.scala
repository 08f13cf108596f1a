package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print the formatted physical plan for named gate queries.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Explain c02_cypher_optional
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv)
    args.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
