package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.query.cypher.{CypherCompiler, CypherWriter}
import graft.schema.SchemaExtensions
import graft.storage.GraphStore

/** The ported extensions are LIVE schemas, not literals: a tenant
  * selecting `roboinvestor` (schemas/manager.py extension choice) gets
  * a working store — DDL-shaped node/rel tables, dedup ingest, the full
  * Cypher read path, and the write path — over tables no roboledger
  * graph has. */
class ExtensionGraphSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val store: GraphStore = {
    val s = new GraphStore(spark,
      Files.createTempDirectory("graft-ext").toString, "investor",
      SchemaExtensions.resolve(Seq("roboinvestor")))
    s.ingestNodes("Portfolio", Seq(
      ("port_growth", "Growth Fund", "growth", "aggressive", 250000.0),
      ("port_income", "Income Fund", "income", "conservative", 120000.0))
      .toDF("id", "name", "strategy", "risk_level", "total_value"))
    s.ingestNodes("Security", Seq(
      ("sec_aaa", "AAA Corp", "AAA"),
      ("sec_bbb", "BBB Inc", "BBB"),
      ("sec_ccc", "CCC Ltd", "CCC"))
      .toDF("id", "name", "ticker"))
    s.ingestNodes("Position", Seq(
      ("pos_1", 100.0, 150.0, 15000.0),
      ("pos_2", 50.0, 80.0, 4000.0),
      ("pos_3", 200.0, 20.0, 4000.0))
      .toDF("id", "quantity", "current_price", "market_value"))
    s.ingestRels("PORTFOLIO_HAS_POSITION", Seq(
      ("port_growth", "pos_1"), ("port_growth", "pos_2"),
      ("port_income", "pos_3")).toDF("src", "dst"))
    s.ingestRels("POSITION_IN_SECURITY", Seq(
      ("pos_1", "sec_aaa"), ("pos_2", "sec_bbb"), ("pos_3", "sec_ccc"))
      .toDF("src", "dst"))
    s
  }

  test("extension tables ingest through the schema (conform + dedup on the extension pk)") {
    assert(store.node("Portfolio").count() === 2)
    // the extension pk is `id` (not base's `identifier`) — dedup keys on it
    store.ingestNodes("Security",
      Seq(("sec_aaa", "AAA Corp dup", "AAA")).toDF("id", "name", "ticker"),
      ignoreErrors = true)
    assert(store.node("Security").count() === 3)
    // declared non-string types survive the conform
    assert(store.node("Position").schema("market_value").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("multi-hop Cypher over extension tables: portfolio -> position -> security") {
    val got = new CypherCompiler(store).run(
      """MATCH (p:Portfolio)-[:PORTFOLIO_HAS_POSITION]->(pos:Position)
               -[:POSITION_IN_SECURITY]->(s:Security)
         WHERE p.risk_level = 'aggressive'
         RETURN s.ticker AS ticker, pos.market_value AS mv
         ORDER BY ticker""").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("AAA", 15000.0), ("BBB", 4000.0)))
  }

  test("aggregation over extension tables: per-portfolio market value") {
    val got = new CypherCompiler(store).run(
      """MATCH (p:Portfolio)-[:PORTFOLIO_HAS_POSITION]->(pos:Position)
         RETURN p.name AS name, sum(pos.market_value) AS total
         ORDER BY name""").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("Growth Fund", 19000.0), ("Income Fund", 4000.0)))
  }

  test("Cypher writes work on an extension graph (MERGE + SET on `id` pk)") {
    val w = new CypherWriter(store)
    w.execute(
      """MERGE (b:Benchmark {id: 'bench_sp'})
         SET b.symbol = 'SPX', b.name = 'S&P 500'""")
    assert(store.node("Benchmark")
      .filter(col("id") === "bench_sp").collect()(0)
      .getAs[String]("symbol") === "SPX")
    w.execute(
      """MATCH (p:Portfolio {id: 'port_growth'})
         MATCH (b:Benchmark {id: 'bench_sp'})
         CREATE (p)-[:PORTFOLIO_BENCHMARKED_AGAINST]->(b)""")
    assert(store.rel("PORTFOLIO_BENCHMARKED_AGAINST").count() === 1)
  }
}
