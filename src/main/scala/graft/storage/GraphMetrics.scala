package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph metrics surface (robosystems/operations/graph/
  * metrics_service.py:237-314: `MATCH (n) RETURN DISTINCT LABEL(n),
  * count(n)` label-less scans, per-type relationship counts, property
  * presence). Label-less `MATCH (n)` = union of all node tables with a
  * literal label column (SURVEY §2.3). */
object GraphMetrics {

  /** Node count per label (skips never-materialized tables). */
  def nodeCounts(store: GraphStore): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    store.schema.nodes.map { n =>
      store.node(n.name).agg(count(lit(1)).as("nodes"))
        .select(lit(n.name).as("label"), col("nodes"))
    }.reduce(_ unionByName _).filter(col("nodes") > 0).orderBy(col("label"))
  }

  /** Relationship count per type. */
  def relCounts(store: GraphStore): DataFrame =
    store.schema.rels.map { r =>
      store.rel(r.name).agg(count(lit(1)).as("rels"))
        .select(lit(r.name).as("rel_type"), lit(r.from).as("from_label"),
          lit(r.to).as("to_label"), col("rels"))
    }.reduce(_ unionByName _).filter(col("rels") > 0).orderBy(col("rel_type"))

  /** One-row totals summary (metrics endpoint shape). */
  def summary(store: GraphStore): DataFrame = {
    val n = nodeCounts(store).agg(
      coalesce(sum(col("nodes")), lit(0L)).as("total_nodes"),
      count(lit(1)).as("node_labels"))
    val r = relCounts(store).agg(
      coalesce(sum(col("rels")), lit(0L)).as("total_rels"),
      count(lit(1)).as("rel_types"))
    n.crossJoin(r)
  }

  /** Per-property non-null coverage for one node table (schema
    * discovery support, middleware/mcp/tools/schema_tool.py shape). */
  def propertyCoverage(store: GraphStore, label: String): DataFrame = {
    val df = store.node(label)
    val props = store.schema.node(label).properties
    // one scan: count(col) skips nulls, so every property's coverage
    // plus the total comes from a single multi-aggregate job (the
    // per-property-job version is P+1 full scans)
    val aggs = count(lit(1)).as("__total") +:
      props.map(p => count(col(p.name)).as(s"__c_${p.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    val spark = store.spark
    import spark.implicits._
    props.map(p => (p.name, p.tpe.toString, row.getAs[Long](s"__c_${p.name}"), total))
      .toDF("property", "type", "non_null", "total")
  }
}
