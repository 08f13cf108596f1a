package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fixtures.AccountingFixture
import graft.operators.{CurationPipeline, PipelineContext, PipelineQueries}
import graft.query.cypher.{CypherCompiler, CypherParser}
import graft.serve.QueryGovernance

/** Regressions for the round-1 self-review findings. */
class ReviewRegressionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val store = AccountingFixture.ingest(
    spark, Files.createTempDirectory("graft-regr").toString, "rg")

  test("OPTIONAL MATCH + WHERE preserves unmatched left rows (Cypher semantics)") {
    // every entity row must survive; the WHERE constrains only which
    // transactions match (amount > 1e9 matches none → count 0 for all)
    val df = new CypherCompiler(store).run(
      """MATCH (e:Entity)
         OPTIONAL MATCH (e)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WHERE t.amount > 1000000000.0
         RETURN e.identifier AS id, count(t) AS n ORDER BY id""")
    val rows = df.collect()
    assert(rows.length === store.node("Entity").count())
    assert(rows.forall(_.getAs[Long]("n") === 0L))
    // and a selective predicate keeps all left rows with partial counts
    val df2 = new CypherCompiler(store).run(
      """MATCH (e:Entity)
         OPTIONAL MATCH (e)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
         WHERE t.amount > 1000.0
         RETURN e.identifier AS id, count(t) AS n ORDER BY id""")
    assert(df2.count() === store.node("Entity").count())
    assert(df2.collect().map(_.getAs[Long]("n")).sum > 0)
  }

  test("OPTIONAL MATCH WHERE over outer variables is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      new CypherCompiler(store).run(
        """MATCH (e:Entity)
           OPTIONAL MATCH (e)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
           WHERE e.identifier = 'ent1'
           RETURN e.identifier AS id, count(t) AS n""")
    }
    assert(e.getMessage.contains("own"))
  }

  test("unbounded var-length path is rejected, not silently one hop") {
    val parsed = CypherParser.parseQuery(
      "MATCH (a:Entity)-[:ENTITY_OWNS_ENTITY*]->(b:Entity) RETURN a.identifier AS x")
    assert(parsed.isRight) // parses…
    val e = intercept[IllegalArgumentException] {
      new CypherCompiler(store).run(
        "MATCH (a:Entity)-[:ENTITY_OWNS_ENTITY*]->(b:Entity) RETURN a.identifier AS x")
    }
    assert(e.getMessage.contains("bounded")) // …but compiles to a clear error
  }

  test("string escapes: literal backslash before n survives") {
    val df = new CypherCompiler(store).run(
      """MATCH (t:Transaction) WHERE t.identifier = 'a\\nb'
         RETURN count(t) AS n""")
    assert(df.collect()(0).getAs[Long]("n") === 0L) // parses; matches nothing
  }

  test("LSH ANN ranks start at 1 with self excluded") {
    // (t09 is now a one-row recall gate — assert the rank/self
    // invariants on the operator itself)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val rows = graft.operators.Similarity.lshTopK(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, dim = 64, nPlanes = 8, bands = 4, excludeSelf = true).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.head === 1, s"qid $q ranks start at ${ranks.head}")
      assert(!rs.exists(_.getAs[Long]("id") === q))
    }
  }

  test("curation audit accounts for null-text rows") {
    val docs = Seq((1L, "a fine document with enough healthy tokens to pass checks today ok"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    PipelineContext.run { implicit ctx =>
      val (kept, dropped) = CurationPipeline.curateWithAudit(docs, "doc_id", "text",
        CurationPipeline.Config(minTokens = 3, minQuality = 0.0))
      assert(kept.count() + dropped.count() === 2)
      assert(dropped.filter(col("doc_id") === 2L)
        .collect()(0).getAs[String]("drop_reason") === "quality")
    }
  }

  test("governance over-length query returns Left, not an exception") {
    val huge = "MATCH (n) RETURN n LIMIT 5 " + (" " * 100001)
    assert(QueryGovernance.validate(huge).isLeft)
  }
}
