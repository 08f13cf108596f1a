package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, PipelineContext}
import graft.operators.Dedup.{JaccardProfile, JaccardRoute, WordGrams}

class JaccardRouteSpec extends SparkTestBase {
  import spark.implicits._

  test("lshBandsFor: fewest bands whose S-curve midpoint sits at or below theta") {
    assert(Dedup.lshBandsFor(0.8) === 8) // midpoint 0.771
    assert(Dedup.lshBandsFor(0.5) === 16) // 0.5 exactly
    assert(Dedup.lshBandsFor(0.3) === 32) // 0.177
    assert(Dedup.lshBandsFor(0.05) === 64) // 0.016 floor
  }

  test("jaccardRouteFor: prefix when its volume bound fits; exact low-theta; LSH otherwise") {
    val small = JaccardProfile(1000L, 500L, 100000L)
    val big = JaccardProfile(1000000L, 500000L, 5000000000L)
    // round 13: the PPJoin prefix engine measures faster than exact at
    // every θ ≥ 0.3 (JaccardRegimes), so within its (1−θ)²·Σdf² volume
    // bound it is the default recall-1 engine
    assert(Dedup.jaccardRouteFor(small, 0.4) === JaccardRoute.Prefix)
    assert(Dedup.jaccardRouteFor(small, 0.9) === JaccardRoute.Prefix)
    // near-degenerate θ: prefixes keep ~everything, filters toothless —
    // the count-aggregation exact engine stays the right plan
    assert(Dedup.jaccardRouteFor(small, 0.2) === JaccardRoute.Exact)
    assert(Dedup.jaccardRouteFor(big, 0.8) === JaccardRoute.Prefix)
    assert(Dedup.jaccardRouteFor(big, 0.65) === JaccardRoute.Prefix)
    // (1−0.4)²·5e9 = 1.8e9 > 1e9 budget and θ < 0.65 → LSH
    assert(Dedup.jaccardRouteFor(big, 0.4) === JaccardRoute.Lsh(64, 32))
    assert(Dedup.jaccardRouteFor(big, 0.5) === JaccardRoute.Lsh(64, 16))
    // budget is the knob: the same corpus routes recall-1 when allowed
    assert(Dedup.jaccardRouteFor(big, 0.4,
      exactBudget = 6000000000L) === JaccardRoute.Prefix)
    assert(Dedup.jaccardRouteFor(big, 0.2,
      exactBudget = 6000000000L) === JaccardRoute.Exact)
  }

  private def tinyCorpus: DataFrame = Seq(
    (1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")

  test("jaccardProfile counts postings, distinct grams and sum df^2 exactly") {
    val p = Dedup.jaccardProfile(tinyCorpus, "doc_id", "text", WordGrams(1))
    // grams: a(df 2), b(2), c(1), d(1)
    assert(p === JaccardProfile(postings = 6L, nGrams = 4L,
      candVolume = 4L + 4L + 1L + 1L))
  }

  private def corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "pack my box with five dozen liquor mugs"),
    (5L, "sphinx of black quartz judge my vow"),
    (6L, "completely unrelated text about spark plans"))
    .toDF("doc_id", "text")

  private def run(f: PipelineContext => DataFrame): Seq[(Long, Long, Double)] =
    PipelineContext.materialize(f)
      .orderBy("id1", "id2")
      .as[(Long, Long, Double)].collect().toSeq

  test("auto route dispatches to exact under budget and matches jaccardPairsExact") {
    val expected = run(implicit ctx =>
      Dedup.jaccardPairsExact(corpus, "doc_id", "text", WordGrams(2), 0.4))
    val got = run(implicit ctx =>
      Dedup.jaccardPairsAuto(corpus, "doc_id", "text", WordGrams(2), 0.4))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("auto route dispatches to prefix over budget at high theta, result identical to exact") {
    val expected = run(implicit ctx =>
      Dedup.jaccardPairsExact(corpus, "doc_id", "text", WordGrams(2), 0.7))
    val got = run(implicit ctx =>
      Dedup.jaccardPairsAuto(corpus, "doc_id", "text", WordGrams(2), 0.7,
        exactBudget = 1L))
    assert(got === expected)
  }

  test("auto route falls to LSH over budget at low theta; pairs are a high-precision subset of exact") {
    val exact = run(implicit ctx =>
      Dedup.jaccardPairsExact(corpus, "doc_id", "text", WordGrams(2), 0.4))
    val got = run(implicit ctx =>
      Dedup.jaccardPairsAuto(corpus, "doc_id", "text", WordGrams(2), 0.4,
        exactBudget = 1L))
    // precision 1 (minhashPairs verifies exact jaccard); recall < 1 allowed
    assert(got.toSet.subsetOf(exact.toSet))
  }
}
