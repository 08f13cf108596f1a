package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.storage.GraphStore

/** Fact-grid pivot (robosystems/operations/views/
  * fact_grid_builder.py:231-278): element rows × period columns,
  * sum-aggregated, zero-filled — `groupBy(element).pivot(period).agg` —
  * plus the app-metadata post-steps: explicit member order (column
  * subset/order) and member labels (column renames). Ordering/labels
  * are presentation metadata, NOT data (fact_grid_builder.py:256-278),
  * so they act on the result frame. */
object FactGrid {

  /** Cap for implicit pivot-column discovery; beyond this the caller
    * must pass `periodCols` (grids wider than this are not a
    * presentation artifact, they're a data problem). */
  val MaxDiscoveredPeriods = 256

  def apply(
      store: GraphStore,
      entityId: Option[String] = None,
      periodCols: Seq[String] = Seq.empty,
      memberLabels: Map[String, String] = Map.empty,
      elementOrder: Seq[String] = Seq.empty): DataFrame = {

    // instant periods carry null end_date (roboledger Period shape);
    // they cannot form pivot columns — fall back to start_date, then
    // drop rows with neither (matching the builder's period_col probe,
    // fact_grid_builder.py:217-222)
    val facts = FactQuery(store, entityId)
      .withColumn("period_end", coalesce(col("period_end"), col("period_start")))
      .filter(col("period_end").isNotNull)
      .select("element_id", "element_name", "period_end", "numeric_value")

    // Pivot columns are driver-side by nature (a pivot needs its column
    // set before planning). Discovery is capped: a fact table with more
    // distinct periods than any presentable grid (reports carry tens of
    // periods, not thousands) must pass explicit `periodCols` — an
    // uncapped collect over a corrupt/unbounded period domain would OOM
    // the driver at scale.
    val periods: Seq[String] =
      if (periodCols.nonEmpty) periodCols
      else {
        val discovered = facts.select("period_end").distinct()
          .limit(MaxDiscoveredPeriods + 1)
          .collect().map(_.getString(0)).sorted.toSeq
        require(discovered.size <= MaxDiscoveredPeriods,
          s"more than $MaxDiscoveredPeriods distinct periods — pass periodCols explicitly")
        discovered
      }

    val pivoted = facts
      .groupBy(col("element_id"), col("element_name"))
      .pivot("period_end", periods)
      .agg(sum(col("numeric_value")))
      .na.fill(0.0, periods)

    // element ordering: app metadata → rank column then drop
    val ordered =
      if (elementOrder.isEmpty) pivoted.orderBy(col("element_name"))
      else {
        val rank = elementOrder.zipWithIndex.toMap
        val rankCol = elementOrder.foldLeft(lit(Int.MaxValue)) { (acc, eid) =>
          when(col("element_id") === eid, lit(rank(eid))).otherwise(acc)
        }
        pivoted.withColumn("__rank", rankCol)
          .orderBy(col("__rank"), col("element_name")).drop("__rank")
      }

    memberLabels.foldLeft(ordered) { case (df, (from, to)) =>
      if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
  }
}
