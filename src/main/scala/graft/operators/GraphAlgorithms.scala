package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.storage.GraphSource

/** Iterative graph algorithms over a [[GraphSource]]'s label-tagged
  * union edge set — the BFS frontier-expansion pattern Spark-native
  * graph processing is built on (each iteration is one distributed
  * join + anti-join; the driver only steers the bounded loop).
  *
  * Reference surface: the validator accepts `shortestPath(...)` with
  * ≤5 hops (robosystems/middleware/mcp/query_validator.py:416-429) and
  * the governance layer prices it; the agents never emit the Cypher
  * text form, so the TEXT form stays priced-not-parsed
  * (serve/QueryGovernance) while the algorithm itself is a first-class
  * operator here. */
object GraphAlgorithms {

  /** All-pairs bounded shortest path lengths: one row per (srcLabel,
    * src, dstLabel, dst) reachable in ≤ maxHops directed hops, with the
    * MINIMUM hop count. Primary keys are only unique per label, so
    * edges carry endpoint labels and every join matches on the
    * (label, key) pair (same contract as PatternQuery.outVarAny).
    *
    * BFS gives min-distance by construction: a pair enters `seen` at
    * the first depth it appears, and the anti-join bars any longer
    * rediscovery. Each frontier is staged (checkpoint) so iteration k's
    * plan doesn't re-derive iterations 1..k-1 — the standard iterative-
    * algorithm lineage guard; at 100 TB these become persisted
    * frontier tables. (Frontier SIZE is graph-dependent: it shrinks on
    * funnel-shaped FK DAGs like TPC-H but grows under fan-out — the
    * anti-join only bounds rediscovery, not expansion.) */
  def shortestPaths(store: GraphSource, maxHops: Int = 5)(
      implicit ctx: PipelineContext): DataFrame = {
    require(maxHops >= 1 && maxHops <= 5,
      "bounded to 1..5 hops (reference validator, query_validator.py:416-429)")
    require(store.schema.rels.nonEmpty,
      s"graph ${store.schema.name} declares no relationship types — nothing to traverse")
    val edges = ctx.stage(store.schema.rels.map { r =>
      store.rel(r.name).select(
        lit(r.from).as("sl"), col("src").cast("string").as("s"),
        lit(r.to).as("dl"), col("dst").cast("string").as("d"))
    }.reduce(_ unionByName _).distinct())

    // per-depth frontiers; `seen` is their UNION of checkpoint leaves
    // (cheap to plan, no re-staging of old depths). Depth 1 is the
    // edge checkpoint itself plus a literal column — re-staging it
    // would materialize a byte-identical second copy of the edge set.
    var frontiers = List(edges.withColumn("dist", lit(1)))
    var exhausted = false
    (2 to maxHops).foreach { k =>
      if (!exhausted) {
        // early exit: once a frontier is empty no deeper one can exist,
        // and the emptiness probe is a cheap local-block check on the
        // just-staged frontier — without it the loop pays the full
        // join+stage cost for provably-empty depths
        if (frontiers.head.isEmpty) exhausted = true
        else {
          val seen = frontiers.reduce(_ unionByName _)
          val expanded = frontiers.head.as("a")
            .join(edges.as("b"),
              col("a.dl") === col("b.sl") && col("a.d") === col("b.s"))
            .select(col("a.sl").as("sl"), col("a.s").as("s"),
              col("b.dl").as("dl"), col("b.d").as("d"))
            .distinct()
          val fresh = ctx.stage(expanded
            .join(seen, Seq("sl", "s", "dl", "d"), "left_anti")
            .withColumn("dist", lit(k)))
          frontiers ::= fresh
        }
      }
    }
    frontiers.reduce(_ unionByName _)
      .select(col("sl").as("src_label"), col("s").as("src"),
        col("dl").as("dst_label"), col("d").as("dst"), col("dist"))
  }

  /** Per-relationship-type degree statistics — the graph-metrics
    * surface (metrics_service.py's node/rel estimates): for each rel
    * type, the number of distinct sources, distinct destinations, and
    * the max/avg out-degree. One scan + one aggregation per rel table,
    * unioned; no joins. */
  def degreeStats(store: GraphSource): DataFrame =
    store.schema.rels.map { r =>
      store.rel(r.name)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .agg(
          count(lit(1)).as("n_src"),
          sum(col("deg")).as("n_edges"),
          max(col("deg")).as("max_out_degree"),
          round(avg(col("deg")), 4).as("avg_out_degree"))
        .select(lit(r.name).as("rel_type"),
          lit(r.from).as("src_label"), lit(r.to).as("dst_label"),
          col("n_src"), col("n_edges"), col("max_out_degree"),
          col("avg_out_degree"))
    }.reduce(_ unionByName _)
}
