package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.storage.GraphStore

/** XBRL → graph ETL operators, the Spark re-expression of the
  * reference's pandas processor (SURVEY.md §2.12;
  * robosystems/adapters/sec/processors/xbrl_graph.py). Instead of
  * ~30 `safe_concat` accumulations on the driver, filings are rows of
  * a DataFrame and every table is derived with distributed transforms.
  */
object XbrlEtl {

  /** XBRL decimal scaling: numeric_value = raw × 10^decimals
    * (xbrl_graph.py:575-583). */
  def scaleNumeric(raw: Column, decimals: Column): Column =
    raw.cast("double") * pow(lit(10.0), decimals.cast("double"))

  /** Deterministic fact identity: md5 over the identifying tuple
    * (adapters/sec/processors/ids.py; xbrl_graph.py:563 md5sum). */
  def factId(parts: Column*): Column =
    md5(concat_ws("|", parts: _*))

  /** Textblock externalization (textblock.py:37-46, used
    * xbrl_graph.py:594-611): values beyond the threshold move to an
    * external resource URL; the row keeps the same `value_type` column
    * contract (inline vs external_resource) plus content length. */
  def externalizeTextblocks(
      df: DataFrame, valueCol: String, idCol: String,
      thresholdBytes: Int = 1024, urlPrefix: String = "ext://textblocks"): DataFrame = {
    val big = length(col(valueCol)) > thresholdBytes
    df.withColumn("content_length", length(col(valueCol)))
      .withColumn("value_type", when(big, lit("external_resource")).otherwise(lit("inline")))
      .withColumn(valueCol,
        when(big, concat(lit(s"$urlPrefix/"), col(idCol))).otherwise(col(valueCol)))
  }

  /** Taxonomy tree → Association rows (xbrl_graph.py:1419-1504): an
    * edge list (parent, child, order, weight, arcrole) becomes
    * Association nodes plus the three relationship tables; roots are
    * parents that never appear as children (left anti join — the tree
    * walk's `root` flag, computed set-wise instead of recursively). */
  def associationsFromEdges(
      edges: DataFrame, // parent_element, child_element, order_value, weight, arcrole
      structureId: String): AssociationTables = {
    val parents = edges.select(col("parent_element")).distinct()
    val children = edges.select(col("child_element")).distinct()
    val roots = parents.join(children,
      parents("parent_element") === children("child_element"), "left_anti")
      .withColumnRenamed("parent_element", "root_element")

    val assoc = edges
      .withColumn("identifier",
        factId(lit(structureId), col("parent_element"), col("child_element"),
          col("arcrole")))
      .join(broadcast(roots),
        col("parent_element") === col("root_element"), "left")
      .withColumn("root", col("root_element").isNotNull.cast("string"))
      .withColumn("association_type", col("arcrole"))
      .withColumn("preferred_label", lit(null).cast("string"))

    AssociationTables(
      associations = assoc.select("identifier", "arcrole", "order_value",
        "association_type", "weight", "root", "preferred_label"),
      structureHasAssociation = assoc.select(
        lit(structureId).as("from"), col("identifier").as("to")),
      fromElement = assoc.select(col("identifier").as("from"),
        col("parent_element").as("to")),
      toElement = assoc.select(col("identifier").as("from"),
        col("child_element").as("to")))
  }

  final case class AssociationTables(
      associations: DataFrame,
      structureHasAssociation: DataFrame,
      fromElement: DataFrame,
      toElement: DataFrame) {
    def ingest(store: GraphStore, fileId: String): Unit = {
      store.ingestNodes("Association", associations, Some(fileId), ignoreErrors = true)
      store.ingestRels("STRUCTURE_HAS_ASSOCIATION", structureHasAssociation, Some(fileId))
      store.ingestRels("ASSOCIATION_HAS_FROM_ELEMENT", fromElement, Some(fileId))
      store.ingestRels("ASSOCIATION_HAS_TO_ELEMENT", toElement, Some(fileId))
    }
  }

  /** Calculation roll-up: parent value = Σ weight × child value over
    * the calculation associations — downstream validation the
    * reference does via graph joins (SURVEY §2.12 last rows). */
  def calculationRollup(
      store: GraphStore, structureId: String, factValues: DataFrame
      /* element_id, value */): DataFrame = {
    val assoc = store.node("Association")
    val sha = store.rel("STRUCTURE_HAS_ASSOCIATION")
      .filter(col("src") === structureId)
    val fromEl = store.rel("ASSOCIATION_HAS_FROM_ELEMENT")
      .select(col("src").as("assoc_id"), col("dst").as("parent_element"))
    val toEl = store.rel("ASSOCIATION_HAS_TO_ELEMENT")
      .select(col("src").as("assoc_id2"), col("dst").as("child_element"))
    assoc.join(sha, assoc("identifier") === sha("dst"))
      .join(fromEl, assoc("identifier") === col("assoc_id"))
      .join(toEl, assoc("identifier") === col("assoc_id2"))
      .join(factValues.withColumnsRenamed(
        Map("element_id" -> "child_element", "value" -> "child_value")),
        Seq("child_element"))
      .groupBy(col("parent_element"))
      .agg(sum(col("weight") * col("child_value")).as("rolled_up"))
  }
}
