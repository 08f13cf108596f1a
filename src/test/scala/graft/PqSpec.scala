package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Product quantization: encode/ADC pinned against driver-side
  * reference arithmetic (the ADC-equals-reconstruction-distance
  * identity is exact, not approximate), training pinned by Lloyd's
  * monotonicity. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def refBooks: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(4)(Seq.fill(8)(Seq.fill(4)(rnd.nextGaussian())))
  }

  test("pqEncode matches a driver-side argmin reference") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val books = refBooks
    val engine = Similarity.pqEncode(vecs.toDF("id", "v"), "id", "v", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until 4).map { m =>
        val sub = v.slice(m * 4, m * 4 + 4).map(_.toDouble)
        (0 until 8).minBy { c =>
          // strict fold, then rely on minBy keeping the FIRST min
          var s = 0.0; var i = 0
          while (i < 4) { val d = sub(i) - books(m)(c)(i); s += d * d; i += 1 }
          s
        }
      }.toVector
      assert(engine(id) === expect, s"codes for vec $id")
    }
  }

  test("ADC distance IS the exact squared L2 to the reconstruction") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 30L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val q = Array.fill(16)(rnd.nextGaussian().toFloat)
    val books = refBooks
    val df = Similarity.pqEncode(vecs.toDF("id", "v"), "id", "v", books)
      .withColumn("adc", VectorFunctions.pqAdc(
        typedLit(q), col("codes"), books))
    val got = df.collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSeq
    got.foreach { case (_, codes, adc) =>
      // reconstruction = chosen codewords; ADC must equal the exact
      // per-subspace-bracketed squared L2 against it
      var acc = 0.0
      (0 until 4).foreach { m =>
        var sub = 0.0; var i = 0
        while (i < 4) {
          val d = q(m * 4 + i).toDouble - books(m)(codes(m))(i); sub += d * d; i += 1
        }
        acc += sub
      }
      assert(adc === acc)
    }
  }

  test("pqAdc surfaces malformed codes as null, never a truncated distance") {
    val books = refBooks
    val q = Array.fill(16)(0.5f)
    val bad = Seq(
      (1L, Array(0, 1, 2)), // wrong length (3, want 4)
      (2L, Array(0, 1, 2, 99)), // out-of-range codeword
      (3L, Array(0, 1, 2, 3)) // fine
    ).toDF("id", "codes")
    val out = bad.withColumn("adc",
      VectorFunctions.pqAdc(typedLit(q), col("codes"), books))
      .orderBy(col("id")).select(col("id"), col("adc")).collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
  }

  test("pqTrain is deterministic and Lloyd's iterations reduce distortion") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val b = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(a === b, "training must be run-stable")
    assert(a.length === 8 && a.forall(bk => bk.length === 16 && bk.forall(_.length === 8)))
    // distortion = mean self-ADC (distance to own reconstruction);
    // corpus == training sample here, so Lloyd's monotonicity applies
    def distortion(books: Seq[Seq[Seq[Double]]]): Double = {
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
        .join(emb.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
        .withColumn("adc", VectorFunctions.pqAdc(col("embedding"), col("codes"), books))
      codes.agg(avg(col("adc"))).collect()(0).getDouble(0)
    }
    val init = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 0)
    assert(distortion(a) <= distortion(init),
      "trained codebook must not be worse than its own init on the sample")
  }

  test("ivfadcTopK at full probe equals the flat ADC scan; partial probe only loses") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val queries = emb.filter(col("vec_id") < 2)
    val flat = Similarity.pqTopK(
      Similarity.pqEncode(emb, "vec_id", "embedding", books), "id", "codes",
      queries, "vec_id", "embedding", books, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Similarity.ivfadcTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", books, k = 8, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(full === flat, "full probe must equal the flat ADC scan")
    // partial probe: per rank, distance can only be >= the full scan's
    val partial = Similarity.ivfadcTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", books, k = 8, nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getDouble(2)).toMap
    partial.foreach { case (key, d) =>
      assert(d >= flat(key)._2 - 1e-9, s"rank $key: partial $d below flat ${flat(key)._2}")
    }
  }

  test("mmrSelect equals a driver-side greedy reference") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val got = graft.operators.PipelineContext.run { implicit ctx =>
      Similarity.mmrSelect(emb, "vec_id", "embedding",
        queryVec = q, k = 5, lambda = 0.5, excludeIds = Seq(0L))
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    }
    // reference greedy with the same rounding discipline
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val qd = vecs(0L)
    var sel = Vector.empty[(Long, Double)]
    (1 to 5).foreach { _ =>
      val cand = vecs.keys.filter(id => id != 0L && !sel.exists(_._1 == id))
      val pick = cand.map { id =>
        val rel = cos(vecs(id), qd)
        val ms = if (sel.isEmpty) rel
          else r6(rel - 0.5 * sel.map(s => cos(vecs(id), vecs(s._1))).max)
        (id, ms)
      }.minBy { case (id, ms) => (-ms, id) }
      sel :+= pick
    }
    assert(got.map(_._2).toSeq === sel.map(_._1))
    got.zip(sel).foreach { case ((_, _, ms), (_, ref)) =>
      assert(math.abs(ms - ref) < 2e-6, s"marginal score $ms vs $ref")
    }
    assert(got.map(_._1).toSeq === (1 to 5))
  }

  test("pqTopK agrees with exact search on the reconstruction space") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val got = Similarity.pqTopK(codes, "id", "codes",
      emb.filter(col("vec_id") < 2), "vec_id", "embedding", books, k = 5)
      .collect()
    assert(got.length === 10)
    // ranks are 1..5 per query, distances non-decreasing within a query
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      assert(sorted.map(_.getDouble(2)).toSeq.sliding(2).forall(p => p.head <= p.last))
    }
  }
}
