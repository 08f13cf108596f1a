package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineContext}
import graft.sources.Tables

/** Round-10 regressions: the t42 scratch-straggler race (release must
  * not delete scratch dirs under an in-flight reader) and repeated
  * segmented-path invocations staying stable and identical. */
class Round10ReviewSpec extends SparkTestBase {

  test("release waits for an in-flight reader of a scratch dir (t42 straggler race)") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val ctx = new PipelineContext
    val dir = ctx.scratchDir("graft-race")
    spark.range(0, 1000, 1, 4).toDF("id").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    // A slow consumer standing in for the AQE broadcast straggler: each
    // task sleeps BEFORE pulling rows, so the parquet read happens
    // while release() is (without the quiesce barrier) deleting the
    // files under it — the round-9 FAILED_READ_FILE flake, on demand.
    val slow = Future {
      df.rdd.mapPartitions { it => Thread.sleep(400); it }.count()
    }(ExecutionContext.global)
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.statusTracker.getActiveJobIds().isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty,
      "straggler job never became active")
    ctx.release() // must wait for the straggler before deleting
    assert(Await.result(slow, 60.seconds) === 1000L)
  }

  test("segmented exact-Jaccard survives rapid repeated invocations") {
    val docs = Tables.documents(spark, sfDir)
    def run(): Seq[(Long, Long, Double)] = PipelineContext.run { implicit ctx =>
      Dedup.jaccardPairsExact(docs, "doc_id", "text",
        shingle = Dedup.WordGrams(2), minJaccard = 0.4,
        maxCandidatesPerBlock = 300000L) // sf0.001 volume ~805k -> 3 blocks
        .orderBy(col("id1"), col("id2"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val first = run()
    assert(first.nonEmpty)
    // back-to-back reruns race each release's scratch delete against
    // the next invocation's jobs; results must stay identical and no
    // invocation may fail
    (1 to 3).foreach(_ => assert(run() === first))
  }
}
