package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, PipelineContext}

/** The r14 sketch-profiling surface: count-min heavy hitters must be
  * EXACT (candidate superset + verify loop), HLL distinct within its
  * error bound, and the route decision pure and pinned. */
class SketchProfilingSpec extends SparkTestBase {
  import spark.implicits._

  // skewed synthetic corpus: a few whales, a long random tail — the
  // shape the sketch exists for
  private def corpus(seed: Int, docs: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val whales = Seq("alpha", "beta", "gamma", "delta")
    (0 until docs).map { i =>
      val words = Seq.fill(6 + rnd.nextInt(10)) {
        if (rnd.nextInt(3) == 0) whales(rnd.nextInt(whales.size))
        else s"w${rnd.nextInt(400)}"
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def hh(df: DataFrame, k: Int): Seq[(String, Long)] =
    PipelineContext.materialize { implicit ctx =>
      CurationPipeline.heavyHitters(df, "text", k)
    }.orderBy(col("tf").desc, col("term")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  private def hhSketch(df: DataFrame, k: Int, width: Int,
      depth: Int): Seq[(String, Long)] =
    PipelineContext.materialize { implicit ctx =>
      CurationPipeline.heavyHittersSketch(df, "text", k, width, depth)
    }.orderBy(col("tf").desc, col("term")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("sketch heavy hitters == exact heavy hitters across corpora, k and widths") {
    for (seed <- Seq(1, 2); docs <- Seq(40, 200); k <- Seq(5, 25)) {
      val df = corpus(seed, docs)
      val exact = hh(df, k)
      assert(hhSketch(df, k, width = 1 << 12, depth = 3) === exact,
        s"seed=$seed docs=$docs k=$k")
      // a deliberately TINY width forces heavy cell collisions and the
      // theta-halving retry loop — the answer must still be exact
      assert(hhSketch(df, k, width = 64, depth = 2) === exact,
        s"collision regime: seed=$seed docs=$docs k=$k")
    }
  }

  test("sketch heavy hitters: vocabulary smaller than k and empty corpus") {
    val tiny = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    assert(hhSketch(tiny, k = 10, width = 128, depth = 3) ===
      hh(tiny, k = 10))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(hhSketch(empty, k = 5, width = 128, depth = 3) === Nil)
  }

  test("profile route is pure in the token count; auto dispatch matches exact") {
    import CurationPipeline.{profileRouteFor, ProfileRoute}
    assert(profileRouteFor(1000L) === ProfileRoute.Exact)
    assert(profileRouteFor(200000000L) === ProfileRoute.Exact)
    assert(profileRouteFor(200000001L) === ProfileRoute.Sketch)
    assert(profileRouteFor(1000L, exactBudget = 10L) === ProfileRoute.Sketch)
    val df = corpus(3, 60)
    val auto = PipelineContext.materialize { implicit ctx =>
      CurationPipeline.heavyHittersAuto(df, "text", k = 10,
        exactBudget = 5L) // forces the sketch route on a tiny corpus
    }.orderBy(col("tf").desc, col("term")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(auto === hh(df, 10))
  }

  test("HLL distinct terms: same schema as exact, estimate within the error bound") {
    val df = corpus(4, 300)
    val exact = CurationPipeline.distinctTerms(df, "text")
    val approx = CurationPipeline.distinctTerms(df, "text",
      approx = true, rsd = 0.01)
    assert(exact.schema === approx.schema)
    assert(exact.schema.head.name === "distinct_terms")
    val e = exact.collect()(0).getLong(0)
    val a = approx.collect()(0).getLong(0)
    assert(e > 0)
    // HLL++ at rsd=0.01: allow 5 sigma — deterministic for a fixed
    // corpus (the hash is fixed), the margin is for corpus changes
    assert(math.abs(a - e).toDouble / e <= 0.05, s"exact=$e approx=$a")
  }
}
