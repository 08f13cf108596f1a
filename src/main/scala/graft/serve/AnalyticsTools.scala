package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.PatternQuery
import graft.query.PatternQuery.p
import graft.storage.GraphStore

/** The MCP templated-analytics tool surface (SURVEY §3.2): schema
  * discovery (middleware/mcp/tools/schema_tool.py) and the fact
  * analysis templates (facts_tool.py:125-272), re-expressed as
  * parameterized PatternQuery pipelines over the store. These are the
  * building blocks an LLM agent calls instead of writing raw Cypher. */
object AnalyticsTools {

  /** get-graph-schema: node/rel tables with their declared columns. */
  def describeSchema(store: GraphStore): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val nodes = store.schema.nodes.map(n =>
      ("node", n.name, n.primaryKey, n.properties.map(_.name).mkString(",")))
    val rels = store.schema.rels.map(r =>
      ("rel", r.name, s"${r.from}->${r.to}",
        ("src" +: "dst" +: r.properties.map(_.name)).mkString(",")))
    (nodes ++ rels).toDF("kind", "name", "key", "columns")
  }

  /** facts_tool fact-type breakdown (facts_tool.py:137-142):
    * count(CASE WHEN …) over the Fact table. */
  def factTypeBreakdown(store: GraphStore): DataFrame =
    PatternQuery.matchNode(store, "f", "Fact").returning(
      "total_facts" -> count(p("f.identifier")),
      "numeric_facts" -> count(when(p("f.numeric_value").isNotNull, lit(1))),
      "text_facts" -> count(when(p("f.fact_type") === "Nonnumeric", lit(1))),
      "textblock_facts" -> count(when(p("f.fact_type") === "Textblock", lit(1))))

  /** facts_tool dimensional analysis (facts_tool.py:154-163): numeric
    * facts per (element, axis, member), optional element filter. */
  def dimensionalPatterns(store: GraphStore,
      elementQname: Option[String] = None, limit: Int = 20): DataFrame = {
    val base = PatternQuery.matchNode(store, "f", "Fact")
      .out("FACT_HAS_ELEMENT", "f", "e")
      .out("FACT_HAS_DIMENSION", "f", "d", optional = true)
      .where(p("f.numeric_value").isNotNull)
    val filtered = elementQname.fold(base)(q => base.where(p("e.qname") === q))
    filtered.returning(
      "element" -> p("e.qname"),
      "dim_type" -> p("d.axis_uri"),
      "dim_value" -> p("d.member_uri"),
      "fact_count" -> count(p("f.identifier")))
      .orderBy(col("fact_count").desc, col("element"))
      .limit(limit)
  }

  /** facts_tool common-aspect combinations (facts_tool.py:205-218):
    * distinct periods/dimensions/units per element. */
  def aspectCombinations(store: GraphStore, limit: Int = 20): DataFrame =
    PatternQuery.matchNode(store, "f", "Fact")
      .out("FACT_HAS_ELEMENT", "f", "e")
      .out("FACT_HAS_PERIOD", "f", "pd", optional = true)
      .out("FACT_HAS_DIMENSION", "f", "d", optional = true)
      .out("FACT_HAS_UNIT", "f", "u", optional = true)
      .where(p("f.numeric_value").isNotNull)
      .returning(
        "element" -> p("e.qname"),
        "periods" -> count_distinct(p("pd.identifier")),
        "dimensions" -> count_distinct(p("d.identifier")),
        "units" -> count_distinct(p("u.identifier")),
        "total_facts" -> count(p("f.identifier")))
      .orderBy(col("total_facts").desc, col("element"))
      .limit(limit)

  /** Temporal coverage: numeric facts per fiscal period. */
  def temporalCoverage(store: GraphStore): DataFrame =
    PatternQuery.matchNode(store, "f", "Fact")
      .out("FACT_HAS_PERIOD", "f", "pd")
      .where(p("f.numeric_value").isNotNull)
      .returning(
        "fiscal_year" -> p("pd.fiscal_year"),
        "fiscal_quarter" -> p("pd.fiscal_quarter"),
        "fact_count" -> count(p("f.identifier")))
      .orderBy(col("fiscal_year"), col("fiscal_quarter"))
}
