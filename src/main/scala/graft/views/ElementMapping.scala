package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Element-mapping view: aggregate SOURCE elements' fact values into
  * TARGET elements per a mapping structure's associations
  * (robosystems/operations/views/element_mapping.py:91
  * `apply_element_mapping`, :183 `_aggregate_values`) — the /views
  * path taken whenever a caller passes `mapping_structure_id`.
  *
  * Semantics, re-expressed relationally:
  *  - value column: `numeric_value` if present else `net_balance`
  *    (facts vs trial-balance inputs, element_mapping.py:108);
  *  - association source URIs resolve to fact element ids through the
  *    facts' own distinct (element_uri, element_id) pairs, falling
  *    back to the raw URI (py:117-121 uri_to_id_map);
  *  - group-by keys: whichever of period_end, period_start, entity_id,
  *    dimension_axis, dimension_member the facts carry (py:123-133);
  *  - per target, ONE aggregation method dispatches the whole group
  *    (py:145 takes associations[0]; list order there is query-result
  *    order, i.e. undefined — here the association with the smallest
  *    (order_value, identifier) decides, a deterministic refinement);
  *  - methods (py:183-217): sum / average / weighted_average
  *    (Σ w·v / Σ w, 0 when Σw = 0) / first / last / calculated (= sum).
  *    The reference's first/last are `iloc[0]`/`iloc[-1]` — input row
  *    order, undefined under distribution — so first/last here order
  *    by (association order_value, element_id, value), again a
  *    deterministic refinement. The reference's weighted path keys its
  *    weight map by raw source URI and silently NaNs when facts carry
  *    mapped ids (py:197-199); weights here flow through the same
  *    uri→id resolution as the join.
  *
  * Output: one row per (target element, group keys): the group keys,
  * `element_id` = target, `element_name` = the target's post-colon
  * local name (py:155), and the aggregated value under the input's
  * value column name. When NO association matches any fact (or the
  * fact input is empty) the ORIGINAL fact frame passes through
  * unchanged — the reference's aggregated-rows-empty return (py:91),
  * replicated here. The reference additionally carries every other
  * column of an arbitrary first row of the group; that carryover is
  * row-order-defined and is deliberately not reproduced.
  *
  * Scale shape: associations are a structure, not data — broadcast;
  * one fact-side shuffle on (target, group keys) with partial
  * aggregation. Nothing is O(corpus) on the driver.
  */
object ElementMapping {

  /** One mapping association (models/api/views.py ElementAssociation). */
  final case class Association(
      identifier: String,
      sourceElement: String,
      targetElement: String,
      aggregationMethod: String = "sum",
      weight: Double = 1.0,
      orderValue: Double = 1.0)

  private val GroupCandidates = Seq(
    "period_end", "period_start", "entity_id",
    "dimension_axis", "dimension_member")

  def apply(facts: DataFrame, associations: Seq[Association]): DataFrame = {
    val spark = facts.sparkSession
    import spark.implicits._
    if (associations.isEmpty) return facts
    val valueCol =
      if (facts.columns.contains("numeric_value")) "numeric_value"
      else "net_balance"
    require(facts.columns.contains(valueCol),
      "facts must carry numeric_value or net_balance")
    val groupCols = GroupCandidates.filter(facts.columns.contains)

    val assoc = associations.toDF()
    // source URI -> fact element id, from the facts' own distinct pairs
    val resolved =
      if (facts.columns.contains("element_uri") &&
          facts.columns.contains("element_id")) {
        val uriMap = facts.select(col("element_uri"), col("element_id"))
          .distinct().withColumnRenamed("element_id", "__mapped")
        assoc.join(broadcast(uriMap),
            assoc("sourceElement") === uriMap("element_uri"), "left")
          .select(assoc.columns.map(col).toIndexedSeq :+
            coalesce(col("__mapped"), col("sourceElement")).as("sourceId"): _*)
      } else assoc.withColumn("sourceId", col("sourceElement"))

    // the dispatching method per target: smallest (order_value,
    // identifier) association decides for the whole group
    val method = assoc
      .groupBy(col("targetElement"))
      .agg(min_by(col("aggregationMethod"),
        struct(col("orderValue"), col("identifier"))).as("__method"))

    // duplicate (target, source) associations collapse to ONE joinable
    // row — the reference's `isin` membership + dict-overwrite
    // semantics (a fact counts once per target however many times its
    // source is listed; the LAST association's weight — by
    // (order_value, identifier) — wins, py:197's dict build; the
    // smallest order_value keys the first/last ordering)
    val perSourcePlan = resolved
      .groupBy(col("targetElement"), col("sourceId"))
      .agg(
        max_by(col("weight"),
          struct(col("orderValue"), col("identifier"))).as("weight"),
        min(col("orderValue")).as("orderValue"))
      .select(col("sourceId"), col("targetElement"),
        col("weight"), col("orderValue"))
    // perSource is association-domain-bounded (targets × resolved
    // sources) but its PLAN embeds the fact-wide uriMap distinct —
    // collect it ONCE into a literal frame so the emptiness probe and
    // the caller's own action stop re-running that corpus pass (r14
    // review: the r13 fix still paid the uriMap scan twice)
    val perSourceRows = perSourcePlan.collect().toIndexedSeq
    val perSource = spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(perSourceRows).asJava),
      perSourcePlan.schema)

    val v = col(valueCol)
    val joined = facts.join(broadcast(perSource),
      facts("element_id") === col("sourceId"))
    val ord = struct(col("orderValue"), facts("element_id"), v)
    val agg = joined
      .groupBy(col("targetElement") +: groupCols.map(col): _*)
      .agg(
        sum(v).as("__sum"),
        avg(v).as("__avg"),
        when(sum(col("weight")) === 0.0, 0.0)
          .otherwise(sum(v * col("weight")) / sum(col("weight"))).as("__wavg"),
        min_by(v, ord).as("__first"),
        max_by(v, ord).as("__last"))
      .join(broadcast(method), Seq("targetElement"))
    val out = agg.select(
      col("targetElement").as("element_id") +:
        regexp_replace(col("targetElement"), "^.*:", "").as("element_name") +:
        groupCols.map(col) :+
        when(col("__method") === "average", col("__avg"))
          .when(col("__method") === "weighted_average", col("__wavg"))
          .when(col("__method") === "first", col("__first"))
          .when(col("__method") === "last", col("__last"))
          .otherwise(col("__sum")) // sum / calculated / unknown
          .as(valueCol): _*)
    // reference parity (element_mapping.py:91/:183): when NO
    // association matches any fact — including empty fact input — the
    // ORIGINAL frame passes through unchanged (aggregated_rows empty ⇒
    // return facts), schema and all. `out` is empty iff no fact joins
    // any association source (perSource targets ⊆ method targets, so a
    // non-empty join survives the agg and the method join), so the
    // probe is a 1-column scan with a LITERAL source-id IN — pushed
    // into the parquet reader, limit-1 early exit — over the
    // driver-collected source-id set. It never executes the
    // aggregation, which the caller's own action would otherwise
    // recompute in full.
    val srcIds = perSourceRows.map(_.get(0)).filter(_ != null)
    val anyMatch = srcIds.nonEmpty &&
      !facts.filter(facts("element_id").isin(srcIds: _*))
        .select(facts("element_id")).isEmpty
    if (anyMatch) out else facts
  }
}
