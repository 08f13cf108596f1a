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
}
