package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.SecFixture
import graft.etl.XbrlEtl
import graft.storage.GraphStore
import graft.views.{FactGrid, FactQuery, SaveView}

/** SEC/XBRL surface: fact query with chained optionals, fact-grid
  * pivot, save-view writes, ETL operators. */
class SecViewsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-sec").toString
  private lazy val store: GraphStore = SecFixture.ingest(spark, root)

  test("fixture lands with expected shapes") {
    assert(store.node("Fact").count() === 400)
    assert(store.node("Element").count() === 25)
    assert(store.rel("FACT_HAS_DIMENSION").count() === 48) // ~12% (ei % 10 == 0)
  }

  test("decimals invariant holds: numeric_value = raw * 10^decimals") {
    val bad = store.node("Fact").filter(
      abs(col("numeric_value") -
        XbrlEtl.scaleNumeric(col("value"), col("decimals"))) > 1e-9)
    assert(bad.count() === 0)
  }

  test("fact query default excludes dimensioned facts (fd IS NULL)") {
    val df = FactQuery(store)
    assert(df.count() === 352) // 400 - 48 dimensioned
    assert(df.filter(col("dimension_axis").isNotNull).count() === 0)
    // sorted by element_name, period_start
    val names = df.select("element_name").collect().map(_.getString(0))
    assert(names.toSeq === names.sorted.toSeq)
  }

  test("fact query with requested dimensions returns only those") {
    val df = FactQuery(store, requestedDimensions = Seq("Element 1"))
    assert(df.count() === 48)
    assert(df.filter(col("dimension_axis") =!= "Element 1").count() === 0)
    assert(df.filter(col("dimension_member") =!= "Element 2").count() === 0)
  }

  test("fact query entity + period filters compose") {
    val df = FactQuery(store, entityId = Some("ent_apple"),
      periodStart = Some("2023-01-01"), periodEnd = Some("2023-12-31"))
    assert(df.count() > 0)
    assert(df.filter(col("entity_id") =!= "ent_apple").count() === 0)
  }

  test("fact grid pivots element x period with zero fill and metadata order") {
    val grid = FactGrid(store, entityId = Some("ent_apple"),
      elementOrder = Seq("elem_3", "elem_4"))
    val cols = grid.columns
    assert(cols.take(2).toSeq === Seq("element_id", "element_name"))
    assert(cols.length > 2) // period columns present
    val first2 = grid.select("element_id").collect().take(2).map(_.getString(0))
    assert(first2.toSeq === Seq("elem_3", "elem_4"))
    // zero-filled: no nulls anywhere in period columns
    val periodCols = cols.drop(2)
    val nulls = grid.select(periodCols.map(c =>
      sum(when(col(s"`$c`").isNull, 1).otherwise(0)).as(c)).toIndexedSeq: _*).collect()(0)
    assert(periodCols.indices.forall(i => nulls.getLong(i) === 0L))
  }

  test("fact grid member labels rename period columns") {
    val grid = FactGrid(store, periodCols = Seq("2023-03-28"),
      memberLabels = Map("2023-03-28" -> "Q1 2023"))
    assert(grid.columns.contains("Q1 2023"))
    assert(!grid.columns.contains("2023-03-28"))
  }

  test("save-view write creates fact + rels; delete unwinds by provenance") {
    val before = store.node("Fact").count()
    val ids = SaveView.createFacts(store, "rep_a_10k", "ent_apple",
      Seq(SaveView.NewFact("elem_1", "123.45", 123.45),
        SaveView.NewFact("elem_2", "67.0", 67.0)), fileId = "sv1")
    assert(ids.length === 2)
    assert(store.node("Fact").count() === before + 2)
    val rel = store.rel("REPORT_HAS_FACT")
      .filter(col("dst").isin(ids: _*))
    assert(rel.count() === 2)
    SaveView.deleteSavedFacts(store, "sv1")
    assert(store.node("Fact").count() === before)
    assert(store.rel("REPORT_HAS_FACT").filter(col("dst").isin(ids: _*)).count() === 0)
  }

  test("save-view rejects unknown anchors (MATCH semantics)") {
    assertThrows[IllegalArgumentException] {
      SaveView.createFacts(store, "rep_nope", "ent_apple",
        Seq(SaveView.NewFact("elem_1", "1", 1.0)), "svX")
    }
    assertThrows[IllegalArgumentException] {
      SaveView.createFacts(store, "rep_a_10k", "ent_apple",
        Seq(SaveView.NewFact("elem_999", "1", 1.0)), "svY")
    }
  }

  test("associations from edges: roots set-wise, weighted rollup") {
    val edges = Seq(
      ("assets", "current_assets", 1.0, 1.0, "calculation"),
      ("assets", "fixed_assets", 2.0, 1.0, "calculation"),
      ("net", "assets", 1.0, 1.0, "calculation"),
      ("net", "liabilities", 2.0, -1.0, "calculation"))
      .toDF("parent_element", "child_element", "order_value", "weight", "arcrole")
    val tables = XbrlEtl.associationsFromEdges(edges, "struct_x")
    val assoc = tables.associations.collect()
    assert(assoc.length === 4)
    val roots = tables.associations.filter(col("root") === "true").count()
    assert(roots === 2) // the two 'net' edges — net never appears as child
    val values = Seq(("current_assets", 60.0), ("fixed_assets", 40.0),
      ("assets", 100.0), ("liabilities", 30.0)).toDF("element_id", "value")
    // ingest then roll up through the store
    val tmp = SecFixture.ingest(spark, Files.createTempDirectory("sec2").toString, "sec2")
    tables.ingest(tmp, "assoc1")
    val rolled = XbrlEtl.calculationRollup(tmp, "struct_x", values)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rolled("assets") === 100.0)
    assert(rolled("net") === 70.0) // 100 - 30
  }

  test("textblock externalization preserves the value_type contract") {
    val df = Seq(("f1", "short"), ("f2", "x" * 5000)).toDF("id", "value")
    val out = XbrlEtl.externalizeTextblocks(df, "value", "id", thresholdBytes = 1024)
      .collect().map(r => r.getString(0) -> (r.getAs[String]("value_type"), r.getAs[String]("value"))).toMap
    assert(out("f1")._1 === "inline" && out("f1")._2 === "short")
    assert(out("f2")._1 === "external_resource")
    assert(out("f2")._2 === "ext://textblocks/f2")
  }
}
