package graft.storage

import org.apache.spark.sql.DataFrame
import graft.schema.GraphSchema

/** Read surface of a property graph: one DataFrame per node label and
  * per relationship type (src/dst). GraphStore is the materialized
  * implementation; view-style sources (e.g. a relational star schema
  * exposed as a graph) implement it virtually. */
trait GraphSource {
  def schema: GraphSchema
  def node(label: String): DataFrame
  def rel(tpe: String): DataFrame

  /** Declares that every rel endpoint references an EXISTING, UNIQUE
    * node primary key (FK integrity + pk uniqueness). When true, the
    * pattern planner elides a far-node join whenever the query touches
    * nothing but that node's key — the join can neither drop nor
    * duplicate rows, so `(c)-[:R]->(o)` with only `count(o)` compiles
    * to a single rel-table join. Virtual sources whose rel tables are
    * FK projections (e.g. [[graft.sources.TpchGraph]]) satisfy this by
    * construction; [[GraphStore]] does not (ingestRels accepts dangling
    * endpoints), so the default is conservative. */
  def referentialIntegrity: Boolean = false

  /** Optional fused `rel(tpe) ⋈ node(rel.to)` frame for rel tables that
    * derive from the SAME storage rows as their destination node (e.g.
    * an order row carries both the FK edge and the node properties).
    * Contract: columns `src`, `dst`, plus every property column of the
    * dst node label (dst equals the node's pk value) — and the rel type
    * must declare NO property columns of its own (the planner falls
    * back to the join path otherwise, since a fused frame has nowhere
    * to carry them). The planner joins this single frame instead of
    * rel ⋈ node — one scan and one join instead of two of each, with
    * Catalyst pruning unused node props from the scan. */
  def relWithDstNode(tpe: String): Option[DataFrame] = None
}
