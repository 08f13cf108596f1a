package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, PipelineContext}
import graft.serve.QueryTimeout
import graft.sources.Tables

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("c4 cleaning: line rules, page rules, and reassembly") {
    val docs = Seq(
      1L -> ("a good first sentence.\nshort two.\nno punct line\n" +
        "this line mentions javascript sadly.\n" +
        "second proper sentence!\nthird proper sentence?"),
      // the lorem line itself passes the LINE rules — the PAGE drop
      // must still win
      2L -> ("a good first sentence.\ncontains lorem ipsum here.\n" +
        "second proper sentence!\nthird good line."),
      3L -> ("a good first sentence.\nbrace { line here.\n" +
        "second proper sentence!\nthird good line."),
      4L -> "only one good sentence.\nnope\nshort."
    ).toDF("doc_id", "text")
    val got = CurationPipeline.c4Clean(docs, "doc_id", "text",
      minLineWords = 3, minSentences = 3).orderBy($"id").collect()
    assert(got(0).getBoolean(2) && got(0).getInt(1) === 3)
    assert(got(0).getString(3) ===
      "a good first sentence.\nsecond proper sentence!\nthird proper sentence?")
    assert(!got(1).getBoolean(2) && got(1).getInt(1) === 4, "lorem page drops")
    assert(!got(2).getBoolean(2), "curly-brace page drops")
    assert(!got(3).getBoolean(2) && got(3).getInt(1) === 1, "sentence floor")
  }

  test("gopher rules: each rule trips on its crafted violation and only there") {
    // a healthy doc: 117 plain words incl. two Gopher stop words
    val good = (Seq.fill(29)("good words the and") :+ "tail").mkString(" ")
    val docs = Seq(
      1L -> good,
      2L -> "too few the and words here",                 // < minWords
      3L -> good.replace("good words", "a a a a a a a"),  // mean len < 3
      4L -> (good + " " + Seq.fill(16)("#").mkString(" ")), // symbols > 10%
      5L -> (Seq.fill(10)("- bullet the and line\n").mkString + good), // >90% would need more; use 10/11 lines bulleted
      6L -> (good + " " + Seq.fill(32)("12345").mkString(" ")), // alpha < 80%
      7L -> good.replace("the and", "zzz qqq")            // no stop words
    ).toDF("doc_id", "text")
    val got = CurationPipeline.gopherRules(docs, "doc_id", "text",
      minWords = 50, minStopwords = 2)
      .orderBy($"id").collect()
    def flags(r: org.apache.spark.sql.Row) = (r.getBoolean(2), r.getBoolean(3),
      r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))
    assert(got(0).getBoolean(8), "healthy doc must keep") // keep
    assert(!got(1).getBoolean(2) && !got(1).getBoolean(8)) // ok_words fails
    assert(!got(2).getBoolean(3), "mean word length must trip")
    assert(!got(3).getBoolean(4), "symbol ratio must trip")
    assert(!got(4).getBoolean(5), "bullet-line ratio must trip")
    assert(!got(5).getBoolean(6), "alpha-word ratio must trip")
    assert(!got(6).getBoolean(7), "stopword rule must trip")
    // the crafted violations are surgical: every OTHER flag on the
    // healthy doc's row holds
    assert(flags(got(0)) === ((true, true, true, true, true, true)))
  }

  test("curation partitions the corpus: kept + dropped = input") {
    val docs = Tables.documents(spark, sfDir)
    PipelineContext.run { implicit ctx =>
      val (kept, dropped) = CurationPipeline.curateWithAudit(
        docs, "doc_id", "text", CurationPipeline.Config())
      assert(kept.count() + dropped.count() === docs.count())
      assert(kept.columns.contains("quality") && kept.columns.contains("lang_pred"))
      val reasons = dropped.select("drop_reason").distinct()
        .as[String].collect().toSet
      assert(reasons.subsetOf(Set("quality", "exact_dup", "near_dup")))
    }
  }

  test("near-dup stage drops the higher id of each planted pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "completely different text about query engines and columnar scans"))
      .toDF("doc_id", "text")
    val ids = PipelineContext.run { implicit ctx =>
      CurationPipeline.curate(docs, "doc_id", "text",
        CurationPipeline.Config(minTokens = 5, minQuality = 0.0, nearDupJaccard = 0.5))
        .select("doc_id").as[Long].collect().sorted
    }
    assert(ids.toSeq === Seq(1L, 3L)) // 2 dropped as near-dup of 1
  }

  test("exact duplicates collapse before near-dedup") {
    val docs = Seq(
      (1L, "the same exact text appears twice in this corpus right here"),
      (2L, "the same exact text appears twice in this corpus right here"),
      (3L, "another unrelated document that talks about something else entirely"))
      .toDF("doc_id", "text")
    PipelineContext.run { implicit ctx =>
      val (kept, dropped) = CurationPipeline.curateWithAudit(docs, "doc_id", "text",
        CurationPipeline.Config(minTokens = 5, minQuality = 0.0))
      assert(kept.count() === 2)
      assert(dropped.filter(col("drop_reason") === "exact_dup").count() === 1)
    }
  }

  test("timeout: fast query completes, slow query cancels") {
    val fast = QueryTimeout.collectWithTimeout(spark,
      Tables.nation(spark, sfDir), timeoutMs = 60000)
    assert(fast.length === 25)
    // a deliberately huge cartesian product cannot finish in 300 ms
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val slow = li.crossJoin(li.select(col("l_orderkey").as("k2")))
      .agg(sum(col("l_quantity")))
    assertThrows[java.util.concurrent.TimeoutException] {
      QueryTimeout.collectWithTimeout(spark, slow, timeoutMs = 300)
    }
  }

  test("timeout bounds are enforced") {
    assertThrows[IllegalArgumentException] {
      QueryTimeout.collectWithTimeout(spark,
        Tables.nation(spark, sfDir), timeoutMs = 500000)
    }
  }
}
