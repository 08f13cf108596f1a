package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphAlgorithms, PipelineContext}
import graft.sources.TpchGraph

/** BFS shortest-path invariants on the TPC-H graph (the g06 gate
  * checks exact counts against a DuckDB recursive CTE; this pins the
  * structural facts the counts rest on). */
class GraphAlgorithmsSpec extends SparkTestBase {

  test("bounded BFS finds min hop counts with label-tagged endpoints") {
    val store = new TpchGraph(spark, sfDir)
    PipelineContext.run { implicit ctx =>
      val sp = GraphAlgorithms.shortestPaths(store, maxHops = 5)
        .persist()
      try {
        // Customer reaches Region only THROUGH Nation: dist exactly 2,
        // and every customer has one
        val custRegion = sp.filter(col("src_label") === "Customer" &&
          col("dst_label") === "Region")
        assert(custRegion.filter(col("dist") =!= 2).count() === 0)
        val nCust = store.node("Customer").count()
        assert(custRegion.select("src").distinct().count() === nCust)
        // direct FK edges are dist 1, never rediscovered longer
        assert(sp.filter(col("src_label") === "Nation" &&
          col("dst_label") === "Region" && col("dist") =!= 1).count() === 0)
        // Order is a sink: nothing is reachable FROM an Order
        assert(sp.filter(col("src_label") === "Order").count() === 0)
        // min-dist uniqueness: one row per (src_label, src, dst_label, dst)
        val dups = sp.groupBy("src_label", "src", "dst_label", "dst")
          .count().filter(col("count") > 1).count()
        assert(dups === 0)
      } finally { sp.unpersist(); () }
    }
  }
}
