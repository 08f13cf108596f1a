package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, PipelineQueries}

class ImageNearDupSpec extends SparkTestBase {

  private val variants = 3

  test("planted near-dup groups are recovered exactly: all within-group pairs, no cross-group pairs") {
    val got = PipelineQueries.t57ImageNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = (for {
      g <- 0 until 60
      a <- 0 until variants
      b <- (a + 1) until variants
    } yield (g.toLong * variants + a, g.toLong * variants + b)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    val cross = gotPairs.filterNot(p => p._1 / variants == p._2 / variants)
    assert(cross.isEmpty, s"cross-group false positives: $cross")
    assert(gotPairs === expected,
      s"missing: ${expected -- gotPairs}; extra: ${gotPairs -- expected}")
    // two flipped pixels out of 256 leave the centered correlation
    // high but measurably below 1 — the 'same photo, tiny edit' regime
    assert(got.forall(p => p._3 >= 0.9 && p._3 <= 1.0))
    assert(got.exists(_._3 < 0.9999), "variants should not be bit-identical")
  }

  test("gate output is deterministic across invocations and matches the committed fixture") {
    val a = PipelineQueries.t57ImageNearDup(spark, sfDir).collect().toSeq
    val b = PipelineQueries.t57ImageNearDup(spark, sfDir).collect().toSeq
    assert(a === b)
    val fixture = new java.io.File("fixtures/t57_expected.parquet")
    if (fixture.exists) {
      val exp = spark.read.parquet(fixture.getPath)
        .orderBy(col("id1"), col("id2")).collect().toSeq
      assert(a === exp, "committed fixture diverges from the live pipeline")
    }
  }

  test("decoded thumbnails of the same group differ only around the flipped pixels") {
    val media = Multimodal.syntheticNearDupImages(spark, nGroups = 2)
    val f = Multimodal.decodeFeaturesJvm(media, side = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f.size === 2 * variants)
    // same group: most features identical (2 of 256 pixels flipped →
    // at most 2 of 64 thumbnail cells move)
    val sameDiff = f(0L).zip(f(1L)).count { case (x, y) => x != y }
    assert(sameDiff <= 8, s"same-group thumbnails differ in $sameDiff cells")
    // different groups: textures are unrelated
    val crossDiff = f(0L).zip(f(3L)).count { case (x, y) => x != y }
    assert(crossDiff > 16, s"cross-group thumbnails differ in only $crossDiff cells")
  }
}
