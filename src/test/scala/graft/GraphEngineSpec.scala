package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.AccountingFixture
import graft.query.PatternQuery
import graft.query.PatternQuery.p
import graft.schema._
import graft.storage.GraphStore
import graft.views.TrialBalance

/** Graph engine core: schema → StructType, ingest dedup semantics,
  * pattern joins, implicit grouping, optional match, trial balance. */
class GraphEngineSpec extends SparkTestBase {

  private lazy val root = Files.createTempDirectory("graft-graph").toString
  private lazy val store = AccountingFixture.ingest(spark, root, "acct", dupFactor = 5)

  test("schema emits StructType with pk non-nullable") {
    val st = RoboledgerSchema.schema.node("Transaction").structType
    assert(st.fieldNames.head === "identifier")
    assert(!st.fields.head.nullable)
    assert(st("amount").dataType === org.apache.spark.sql.types.DoubleType)
    assert(RoboledgerSchema.schema.validate().isEmpty)
  }

  test("base+extension compose without clashes") {
    val s = RoboledgerSchema.schema
    assert(s.nodeByName.contains("Entity") && s.nodeByName.contains("Fact"))
    assert(s.relByName.contains("ENTITY_HAS_TRANSACTION"))
    assert(s.nodes.map(_.name).distinct.size === s.nodes.size)
  }

  test("custom JSON schema parses (custom_graph_demo shape)") {
    val json =
      """{"name":"demo","version":"1.0","nodes":[
        {"name":"Company","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"founded_year","type":"INT64"}]},
        {"name":"Person","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"age","type":"INT64"}]}],
        "relationships":[{"name":"PERSON_WORKS_FOR_COMPANY",
          "from_node":"Person","to_node":"Company",
          "properties":[{"name":"role","type":"STRING"}]}]}"""
    val s = CustomSchemaJson.parse(json)
    assert(s.node("Company").primaryKey === "identifier")
    assert(s.rel("PERSON_WORKS_FOR_COMPANY").structType.fieldNames.toSeq ===
      Seq("src", "dst", "role"))
    assertThrows[IllegalArgumentException] {
      CustomSchemaJson.parse("""{"name":"bad","nodes":[],"relationships":[
        {"name":"R","from_node":"X","to_node":"Y"}]}""")
    }
  }

  test("ingest dedups injected duplicates by primary key") {
    assert(store.node("Element").count() === 18)
    assert(store.node("Transaction").count() === 60)
    assert(store.node("LineItem").count() === 120)
    assert(store.rel("ENTITY_HAS_TRANSACTION").count() === 60)
  }

  test("ignoreErrors re-ingest drops existing keys instead of duplicating") {
    import spark.implicits._
    val again = Seq(("elem1000", "Cash Again")).toDF("identifier", "name")
    val written = store.ingestNodes("Element", again, Some("f1"), ignoreErrors = true)
    assert(written === 0)
    assert(store.node("Element").count() === 18)
  }

  test("file provenance delete removes only that file's rows") {
    import spark.implicits._
    val extra = Seq(("elem9999", "Temp Account")).toDF("identifier", "name")
    store.ingestNodes("Element", extra, Some("f2"), ignoreErrors = true)
    assert(store.node("Element").count() === 19)
    store.deleteFileData("Element", "f2")
    assert(store.node("Element").count() === 18)
  }

  test("pattern hop joins node⋈rel⋈node") {
    val got = PatternQuery.matchNode(store, "e", "Entity")
      .out("ENTITY_HAS_TRANSACTION", "e", "t")
      .returning("id" -> p("t.identifier"))
    assert(got.count() === 60)
  }

  test("implicit grouping: non-aggregate items become keys") {
    val got = PatternQuery.matchNode(store, "t", "Transaction")
      .returning(
        "type" -> p("t.type"),
        "n" -> count(lit(1)),
        "total" -> sum(p("t.amount")))
      .collect()
    assert(got.length === 1) // single 'journal' type
    assert(got(0).getAs[Long]("n") === 60)
  }

  test("optional match keeps unmatched left rows as nulls") {
    // Process has no rels in the fixture; Entity→Transaction all match.
    val matched = PatternQuery.matchNode(store, "e", "Entity")
      .out("ENTITY_HAS_TRANSACTION", "e", "t", optional = true)
      .df
    assert(matched.count() === 60)
    // ingest a second entity with no transactions: left row survives
    import spark.implicits._
    store.ingestNodes("Entity",
      Seq(("ent2", "Shell Co")).toDF("identifier", "name"), Some("f3"))
    val withLonely = PatternQuery.matchNode(store, "e", "Entity")
      .out("ENTITY_HAS_TRANSACTION", "e", "t", optional = true)
      .df
    assert(withLonely.count() === 61)
    val lonely = withLonely.filter(p("e.identifier") === "ent2")
    assert(lonely.count() === 1)
    assert(lonely.collect()(0).getAs[String]("t__identifier") === null)
  }

  test("trial balance balances: Σdebits == Σcredits == expected") {
    val tb = TrialBalance(store, "2024-01-01", "2024-12-31")
    val rows = tb.collect()
    assert(rows.nonEmpty)
    val debits = rows.map(_.getAs[Double]("total_debits")).sum
    val credits = rows.map(_.getAs[Double]("total_credits")).sum
    assert(math.abs(debits - credits) < 1e-6)
    assert(math.abs(debits - AccountingFixture.expectedTotal) < 1e-6)
    val names = rows.map(_.getAs[String]("element_name"))
    assert(names === names.sorted)
  }

  test("trial balance date filter restricts to the window") {
    val jan = TrialBalance(store, "2024-01-01", "2024-01-31")
    val janTotal = jan.collect().map(_.getAs[Double]("total_debits")).sum
    assert(janTotal > 0 && janTotal < AccountingFixture.expectedTotal)
  }

  test("fork copies the graph; writes diverge") {
    val forked = store.fork("acct2")
    assert(forked.node("Element").count() === store.node("Element").count())
    import spark.implicits._
    forked.ingestNodes("Element",
      Seq(("elemX", "Fork Only")).toDF("identifier", "name"), Some("ff"))
    assert(forked.node("Element").count() === store.node("Element").count() + 1)
  }

  test("sql passthrough over registered views") {
    store.registerViews()
    val n = spark.sql(
      "SELECT count(*) AS n FROM Transaction WHERE amount > 0").collect()(0).getAs[Long]("n")
    assert(n === 60)
  }
}
