package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema._

/** The six ported extensions (reference
  * robosystems/schemas/extensions/ modules) — table counts, StructType
  * round-trip, DDL parity with models.py to_cypher, and the
  * manager.py-style name resolution. */
class ExtensionSchemasSpec extends AnyFunSuite {

  private val expectCounts = Map(
    // (nodes, rels) counted from each reference module's literals
    "roboinvestor" -> (8, 13),
    "robofo" -> (12, 26),
    "robohrm" -> (8, 17),
    "roboepm" -> (8, 16),
    "roboscm" -> (10, 16),
    "roboreport" -> (8, 14))

  test("every extension resolves by name with the reference's table counts") {
    expectCounts.foreach { case (name, (nNodes, nRels)) =>
      val ext = SchemaExtensions.extension(name)
      assert(ext.nodes.size === nNodes, s"$name nodes")
      assert(ext.rels.size === nRels, s"$name rels")
      assert(ext.name === name)
    }
    // registry = roboledger + the six
    assert(SchemaExtensions.names.toSet ===
      expectCounts.keySet + "roboledger")
    val err = intercept[IllegalArgumentException](SchemaExtensions.extension("nope"))
    assert(err.getMessage.contains("roboinvestor"))
  }

  test("node StructType round-trip: declared properties become fields, pk non-nullable") {
    val portfolio = RoboinvestorSchema.nodes.head
    assert(portfolio.name === "Portfolio")
    assert(portfolio.primaryKey === "id")
    val st = portfolio.structType
    assert(st.fieldNames.toSeq ===
      Seq("id", "name", "strategy", "risk_level", "inception_date", "total_value"))
    assert(st("id").dataType === StringType && !st("id").nullable)
    assert(st("inception_date").dataType === DateType)
    assert(st("total_value").dataType === DoubleType)
    // declared non-STRING types survive in every extension
    assert(RoboscmSchema.extension.node("Inventory")
      .structType("last_updated").dataType === TimestampType)
    assert(RoboreportSchema.extension.node("Submission")
      .structType("submission_date").dataType === TimestampType)
    assert(RobofoSchema.extension.node("Lead")
      .structType("lead_score").dataType === LongType)
    assert(RobohrmSchema.extension.node("Payroll")
      .structType("pay_date").dataType === DateType)
  }

  test("rel StructType round-trip: src/dst head columns then properties") {
    val r = RoboscmSchema.extension.rel("SUPPLIER_PROVIDES_PRODUCT")
    val st = r.structType
    assert(st.fieldNames.take(2).toSeq === Seq("src", "dst"))
    assert(st.fieldNames.drop(2).toSeq === Seq(
      "lead_time_days", "minimum_order_quantity", "supplier_part_number",
      "unit_price", "effective_date", "expiration_date"))
    assert(st("lead_time_days").dataType === LongType)
    assert(st("effective_date").dataType === DateType)
  }

  test("DDL parity with models.py to_cypher") {
    // Node.to_cypher (models.py:33): IF NOT EXISTS + trailing PRIMARY KEY
    val bench = RoboinvestorSchema.extension.node("Benchmark")
    assert(bench.ddl() ===
      """CREATE NODE TABLE IF NOT EXISTS Benchmark(
        |        id STRING,
        |        symbol STRING,
        |        name STRING,
        |        description STRING,
        |        PRIMARY KEY(id)
        |    )""".stripMargin)
    // Relationship.to_cypher (models.py:76): FROM/TO then properties
    val rel = RoboinvestorSchema.extension.rel("PORTFOLIO_BENCHMARKED_AGAINST")
    assert(rel.ddl() ===
      "CREATE REL TABLE IF NOT EXISTS PORTFOLIO_BENCHMARKED_AGAINST(" +
        "FROM Portfolio TO Benchmark,\n        benchmark_weight DOUBLE)")
    // property-less rel has no trailing comma (base schema form)
    assert(BaseSchema.schema.rel("ENTITY_OWNS_ENTITY").ddl() ===
      "CREATE REL TABLE IF NOT EXISTS ENTITY_OWNS_ENTITY(FROM Entity TO Entity)")
    // safe_mode=False drops the existence clause
    assert(rel.ddl(safeMode = false).startsWith(
      "CREATE REL TABLE PORTFOLIO_BENCHMARKED_AGAINST("))
  }

  test("resolve composes base + extensions like manager.py load_and_compile_schema") {
    val s = SchemaExtensions.resolve(Seq("roboledger", "roboinvestor"))
    // base tables still present
    assert(s.nodeByName.contains("Entity") && s.nodeByName.contains("Period"))
    // both extensions' tables present
    assert(s.nodeByName.contains("Fact") && s.nodeByName.contains("Portfolio"))
    assert(s.relByName.contains("ENTITY_ISSUES_SECURITY"))
    assert(s.name === "base+roboledger+roboinvestor")
  }

  test("faithful reference quirk: dangling User endpoints surface in validate()") {
    val s = SchemaExtensions.resolve(Seq("roboinvestor"))
    val problems = s.validate()
    assert(problems.exists(_.contains("USER_MANAGES_PORTFOLIO")),
      s"expected dangling-User finding, got $problems")
    // and a fully-resolvable selection is clean except documented gaps
    val scm = SchemaExtensions.resolve(Seq("roboscm"))
    assert(scm.validate().isEmpty,
      s"roboscm is self-contained in the reference: ${scm.validate()}")
  }

  test("faithful reference quirk: robofo and roboscm both declare Contact/Address") {
    val fo = SchemaExtensions.resolve(Seq("robofo"))
    assert(fo.node("Contact").structType.fieldNames.contains("first_name"))
    // later extension wins the clash (explicit form of the reference's
    // first-CREATE-wins concatenation; order is the tenant's choice)
    val both = SchemaExtensions.resolve(Seq("robofo", "roboscm"))
    assert(both.node("Contact").structType.fieldNames.contains("department"))
    assert(!both.node("Contact").structType.fieldNames.contains("first_name"))
    // cross-extension dependency: robohrm's Contact/Address rels resolve
    // once robofo is also selected
    val hrmAlone = SchemaExtensions.resolve(Seq("robohrm"))
    assert(hrmAlone.validate().exists(_.contains("EMPLOYEE_HAS_CONTACT")))
    val hrmWithFo = SchemaExtensions.resolve(Seq("robofo", "robohrm"))
    assert(!hrmWithFo.validate().exists(_.contains("EMPLOYEE_HAS_CONTACT")))
  }
}
