package graft.views

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.storage.GraphStore

/** The write path of a saved view (robosystems/operations/views/
  * save_view.py:210-330): MATCH existing Report/Element/Entity, CREATE
  * Fact + REPORT_HAS_FACT / FACT_HAS_ELEMENT / FACT_HAS_ENTITY in one
  * statement — here as a single batched append per table (the
  * reference loops row-at-a-time through Cypher; batching is the Spark
  * shape of the same writes), plus the delete-report-subtree used on
  * re-save (save_view.py:121). */
object SaveView {

  final case class NewFact(
      elementId: String, value: String, numericValue: Double,
      factType: String = "Numeric")

  /** Returns the generated fact ids (UUID-free: deterministic ids from
    * content position keep replays idempotent alongside ignore-errors
    * ingest). */
  def createFacts(
      store: GraphStore, reportId: String, entityId: String,
      facts: Seq[NewFact], fileId: String): Seq[String] = {
    val spark: SparkSession = store.spark
    import spark.implicits._

    // MATCH semantics: verify the anchors exist before creating
    require(!store.node("Report")
      .filter(col("identifier") === reportId).isEmpty, s"no report $reportId")
    require(!store.node("Entity")
      .filter(col("identifier") === entityId).isEmpty, s"no entity $entityId")
    val elementIds = facts.map(_.elementId).distinct
    val known = store.node("Element")
      .filter(col("identifier").isin(elementIds: _*))
      .select("identifier").as[String].collect().toSet
    val missing = elementIds.filterNot(known)
    require(missing.isEmpty, s"unknown elements: ${missing.mkString(", ")}")

    val withIds = facts.zipWithIndex.map { case (f, i) =>
      (s"fact_${reportId}_${fileId}_$i", f)
    }
    store.ingestNodes("Fact", withIds.map { case (id, f) =>
      (id, f.value, f.numericValue, f.factType, "2", "numeric", "monetary")
    }.toDF("identifier", "value", "numeric_value", "fact_type", "decimals",
      "value_type", "content_type"), Some(fileId))
    store.ingestRels("REPORT_HAS_FACT",
      withIds.map { case (id, _) => (reportId, id) }.toDF("from", "to"), Some(fileId))
    store.ingestRels("FACT_HAS_ELEMENT",
      withIds.map { case (id, f) => (id, f.elementId) }.toDF("from", "to"), Some(fileId))
    store.ingestRels("FACT_HAS_ENTITY",
      withIds.map { case (id, _) => (id, entityId) }.toDF("from", "to"), Some(fileId))
    withIds.map(_._1)
  }

  /** DETACH DELETE of a report's fact subtree (save_view.py:121):
    * remove the report's facts and their relationship rows by file
    * provenance — the Spark-side equivalent of the reference's
    * per-file incremental un-ingest (manager.py:626). */
  def deleteSavedFacts(store: GraphStore, fileId: String): Unit = {
    store.deleteFileData("Fact", fileId)
    Seq("REPORT_HAS_FACT", "FACT_HAS_ELEMENT", "FACT_HAS_ENTITY")
      .foreach(t => store.deleteRelFileData(t, fileId))
  }
}
