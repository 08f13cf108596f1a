package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.storage.GraphStore

/** The fact-retrieval view (robosystems/operations/views/
  * fact_query.py:48-104): four conjunctive MATCHes sharing `f`, then a
  * *chained* OPTIONAL MATCH — (f)-[:FACT_HAS_DIMENSION]->(fd)
  * -[:…AXIS_ELEMENT]->(axis), then (fd)-[:…MEMBER_ELEMENT]->(member) —
  * with the `fd IS NULL` default filter (undimensioned facts only)
  * when no dimensions are requested. The chained optional is the
  * SURVEY §7 "hard part": the whole subtree must null out together, so
  * it is pre-joined before one left join. */
object FactQuery {

  def apply(
      store: GraphStore,
      entityId: Option[String] = None,
      periodStart: Option[String] = None,
      periodEnd: Option[String] = None,
      requestedDimensions: Seq[String] = Seq.empty): DataFrame = {

    def ns(df: DataFrame, v: String): DataFrame =
      df.select(df.columns.map(c => col(c).as(s"${v}__$c")).toIndexedSeq: _*)

    val f = ns(store.node("Fact"), "f")
    val e = ns(store.node("Element"), "e")
    val p = ns(store.node("Period"), "p")
    val u = ns(store.node("Unit"), "u")
    val ent = ns(store.node("Entity"), "ent")

    def rel(t: String, v: String): DataFrame = ns(store.rel(t), v)

    // conjunctive MATCHes sharing f → successive inner joins on f's key
    val base = f
      .join(rel("FACT_HAS_ELEMENT", "r1"), col("f__identifier") === col("r1__src"))
      .join(e, col("r1__dst") === col("e__identifier"))
      .join(rel("FACT_HAS_PERIOD", "r2"), col("f__identifier") === col("r2__src"))
      .join(p, col("r2__dst") === col("p__identifier"))
      .join(rel("FACT_HAS_UNIT", "r3"), col("f__identifier") === col("r3__src"))
      .join(u, col("r3__dst") === col("u__identifier"))
      .join(rel("FACT_HAS_ENTITY", "r4"), col("f__identifier") === col("r4__src"))
      .join(ent, col("r4__dst") === col("ent__identifier"))

    // chained OPTIONAL MATCH: pre-join fd⋈axis (and separately member)
    // so each optional subtree nulls out as a unit
    val fd = ns(store.node("FactDimension"), "fd")
    val axis = ns(store.node("Element"), "axis")
    val member = ns(store.node("Element"), "member")
    val dimSubtree = rel("FACT_HAS_DIMENSION", "r5")
      .join(fd, col("r5__dst") === col("fd__identifier"))
      .join(rel("FACT_DIMENSION_AXIS_ELEMENT", "r6"),
        col("fd__identifier") === col("r6__src"))
      .join(axis, col("r6__dst") === col("axis__identifier"))
    val withDim = base.join(dimSubtree,
      col("f__identifier") === col("r5__src"), "left")
    val memberSubtree = rel("FACT_DIMENSION_MEMBER_ELEMENT", "r7")
      .join(member, col("r7__dst") === col("member__identifier"))
    val joined = withDim.join(memberSubtree,
      col("fd__identifier") === col("r7__src"), "left")

    // filters mirror fact_query.py:60-83 (dates are ISO strings
    // compared lexicographically — trial_balance.py:40-41 semantics)
    val conds = Seq(
      entityId.map(id => col("ent__identifier") === id),
      periodStart.map(s =>
        col("p__start_date") >= s || col("p__end_date") >= s),
      periodEnd.map(s =>
        col("p__end_date") <= s || col("p__start_date") <= s),
      if (requestedDimensions.isEmpty) Some(col("fd__identifier").isNull)
      else Some(col("axis__name").isin(requestedDimensions: _*))
    ).flatten
    val filtered = conds.foldLeft(joined)(_ filter _)

    filtered.select(
      col("f__identifier").as("fact_id"),
      col("f__numeric_value").as("numeric_value"),
      col("e__identifier").as("element_id"),
      col("e__name").as("element_name"),
      col("e__classification").as("element_classification"),
      col("e__period_type").as("element_period_type"),
      col("p__identifier").as("period_id"),
      col("p__start_date").as("period_start"),
      col("p__end_date").as("period_end"),
      col("p__fiscal_year").as("fiscal_year"),
      col("u__value").as("unit_value"),
      col("ent__identifier").as("entity_id"),
      col("axis__name").as("dimension_axis"),
      col("member__name").as("dimension_member"))
      .orderBy(col("element_name"), col("period_start"), col("fact_id"))
  }
}
