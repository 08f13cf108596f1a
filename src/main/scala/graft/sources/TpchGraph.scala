package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema._
import graft.storage.GraphSource

/** The driver's TPC-H-ish star schema exposed *virtually* as a
  * property graph (no materialization): node labels over the dimension/
  * fact tables, relationship tables derived from foreign keys. This
  * lets the PatternQuery engine run under the DuckDB differential gate
  * on the exact same parquet — the graph layer adds renames only, so
  * Catalyst still pushes filters/pruning into the original scans. */
final class TpchGraph(spark: SparkSession, dir: String) extends GraphSource {
  import GraftType._

  private def pk = Property("identifier", STRING, isPrimaryKey = true)

  val schema: GraphSchema = GraphSchema("tpch-graph", "1.0",
    nodes = Seq(
      NodeDef("Region", Seq(pk, Property("name", STRING))),
      NodeDef("Nation", Seq(pk, Property("name", STRING))),
      NodeDef("Customer", Seq(pk, Property("name", STRING),
        Property("acctbal", DOUBLE), Property("mktsegment", STRING))),
      NodeDef("Supplier", Seq(pk, Property("name", STRING),
        Property("acctbal", DOUBLE))),
      NodeDef("Order", Seq(pk, Property("status", STRING),
        Property("totalprice", DOUBLE), Property("orderdate", TIMESTAMP),
        Property("priority", STRING)))),
    rels = Seq(
      RelDef("NATION_IN_REGION", "Nation", "Region"),
      RelDef("CUSTOMER_IN_NATION", "Customer", "Nation"),
      RelDef("SUPPLIER_IN_NATION", "Supplier", "Nation"),
      RelDef("CUSTOMER_PLACED_ORDER", "Customer", "Order",
        // one rel-prop-carrying type among prop-less siblings: the
        // sparse-supertype any-rel projection (c16) needs exactly this
        // asymmetry on the sf graph
        Seq(Property("price", DOUBLE)))))

  private def s(c: String) = col(c).cast("string")

  def node(label: String): DataFrame = label match {
    case "Region" => Tables.region(spark, dir)
      .select(s("r_regionkey").as("identifier"), col("r_name").as("name"))
    case "Nation" => Tables.nation(spark, dir)
      .select(s("n_nationkey").as("identifier"), col("n_name").as("name"))
    case "Customer" => Tables.customer(spark, dir)
      .select(s("c_custkey").as("identifier"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"))
    case "Supplier" => Tables.supplier(spark, dir)
      .select(s("s_suppkey").as("identifier"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"))
    case "Order" => Tables.orders(spark, dir)
      .select(s("o_orderkey").as("identifier"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("totalprice"), col("o_orderdate").as("orderdate"),
        col("o_orderpriority").as("priority"))
    case other => throw new NoSuchElementException(s"node table $other")
  }

  /** Every rel table below is a projection of a table whose FK columns
    * reference existing unique pks (TPC-H integrity), so far-node joins
    * on key-only access are elidable. */
  override def referentialIntegrity: Boolean = true

  /** CUSTOMER_PLACED_ORDER derives from the `orders` table — the same
    * rows that back the Order node — so the rel⋈Order join is an
    * identity self-join on the unique orderkey and can be served from
    * ONE scan carrying both the edge and the node properties. */
  override def relWithDstNode(tpe: String): Option[DataFrame] = tpe match {
    case "CUSTOMER_PLACED_ORDER" => Some(Tables.orders(spark, dir)
      .select(s("o_custkey").as("src"), s("o_orderkey").as("dst"),
        col("o_totalprice").as("price"),
        s("o_orderkey").as("identifier"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("totalprice"), col("o_orderdate").as("orderdate"),
        col("o_orderpriority").as("priority")))
    case _ => None
  }

  def rel(tpe: String): DataFrame = tpe match {
    case "NATION_IN_REGION" => Tables.nation(spark, dir)
      .select(s("n_nationkey").as("src"), s("n_regionkey").as("dst"))
    case "CUSTOMER_IN_NATION" => Tables.customer(spark, dir)
      .select(s("c_custkey").as("src"), s("c_nationkey").as("dst"))
    case "SUPPLIER_IN_NATION" => Tables.supplier(spark, dir)
      .select(s("s_suppkey").as("src"), s("s_nationkey").as("dst"))
    case "CUSTOMER_PLACED_ORDER" => Tables.orders(spark, dir)
      .select(s("o_custkey").as("src"), s("o_orderkey").as("dst"),
        col("o_totalprice").as("price"))
    case other => throw new NoSuchElementException(s"rel table $other")
  }
}
