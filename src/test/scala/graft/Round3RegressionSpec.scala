package graft

import org.apache.spark.sql.functions._
import graft.serve.QueryGovernance
import graft.serve.QueryGovernance.QueryKind

/** Regressions for the round-2 judge findings (ADVICE.md round 3). */
class Round3RegressionSpec extends SparkTestBase {

  // -- QueryGovernance.hasClauseKeyword (medium finding) ---------------

  test("property named like an expr-context word cannot suppress a write clause") {
    // `c.not` / `c.in` / `c.case` directly before DELETE/SET: the word
    // before the clause is itself '.'-prefixed, so it must NOT count as
    // expression context.
    assert(QueryGovernance.classify("MATCH (c) WHERE c.not DELETE c") == QueryKind.Write)
    assert(QueryGovernance.classify("MATCH (c) WHERE c.in SET c.x = 1") == QueryKind.Write)
    assert(QueryGovernance.classify("MATCH (c) WHERE c.case REMOVE c.x") == QueryKind.Write)
  }

  test("CALL { CREATE ... } subquery classifies Write, map keys still suppressed") {
    assert(QueryGovernance.classify("CALL { CREATE (n:X) } RETURN 1") == QueryKind.Write)
    // map literal keys named like write keywords are not write clauses
    assert(QueryGovernance.classify("RETURN {set: 1, delete: 2} AS m") == QueryKind.Read)
    assert(QueryGovernance.classify("WITH {a: 1, set: 2} AS m RETURN m") == QueryKind.Read)
  }

  test("genuine expr-context suppression still works after the fix") {
    assert(QueryGovernance.classify("MATCH (c) RETURN c.set AS use") == QueryKind.Read)
    assert(QueryGovernance.classify("MATCH (c) WHERE c.x IN [1,2] RETURN c") == QueryKind.Read)
    assert(QueryGovernance.classify("MATCH (c) RETURN c.name AS create") == QueryKind.Read)
    assert(QueryGovernance.classify("MATCH (n) SET n.x = 1") == QueryKind.Write)
    assert(QueryGovernance.classify("CREATE (n:X {a: 1})") == QueryKind.Write)
  }

  // -- VecDot length-mismatch null (low finding) -----------------------

  test("vec_dot yields null on length mismatch, not a truncated similarity") {
    import graft.functions.VectorFunctions
    val df = spark.createDataFrame(Seq(
      (1, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f, 1.0f)), // equal length
      (2, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f))        // mismatch
    )).toDF("id", "a", "b")
    val rows = df.select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 6.0)
    assert(rows(1).isNullAt(1), "mismatched lengths must surface as null")
    // cosine built on dot inherits the policy
    val c = df.select(col("id"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(!c(0).isNullAt(1))
    assert(c(1).isNullAt(1))
  }

  // -- jaccardPairsExact: no forced broadcast (low finding) ------------

  test("jaccardPairsExact still finds the planted near-dup pairs without broadcast hints") {
    import graft.operators.{Dedup, PipelineContext}
    val docs = graft.sources.Tables.documents(spark, sfDir)
    PipelineContext.run { implicit ctx =>
      val pairs = Dedup.jaccardPairsExact(docs, "doc_id", "text",
        Dedup.WordGrams(2), minJaccard = 0.4)
      assert(pairs.count() > 0)
      // No static broadcast hint; AQE may still CHOOSE broadcast at
      // runtime, which is the point. ResolvedHint nodes are erased by
      // the optimizer (EliminateResolvedHint), so assert on the
      // ANALYZED plan, where a broadcast() call would still be visible
      // — the old optimizedPlan check was vacuously true.
      val analyzed = pairs.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"), "no static broadcast hint expected")
      val optimized = pairs.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("strategy=broadcast"),
        "no broadcast join strategy hint expected in the optimized plan")
    }
  }
}
