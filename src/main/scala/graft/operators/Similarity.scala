package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *    query set against the corpus — one pass, no shuffle of the
  *    corpus, `TakeOrdered`-style window per query. At 100 TB this is
  *    the correct plan whenever |queries| is broadcastable.
  *  - [[lshTopK]] is the scale path for large query sets: both sides
  *    bucketed by sign-bit LSH (multi-probe over the query's bucket),
  *    candidates joined per bucket, cosine reranked. Recall < 1 by
  *    construction; raise nProbes/lower nPlanes to trade cost for
  *    recall. */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine. Queries must be
    * driver-small (broadcast). Deterministic tie-break on corpus id. */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    // norms once per VECTOR (n + q rows), not per PAIR (n×q rows) —
    // the pair loop then does a single codegen'd dot per candidate
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", l2Norm(col("v")))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
        .withColumn("nq", l2Norm(col("qv")))))
      .withColumn("cosine", cosinePre(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Train IVF centroids: Lloyd's k-means on a bounded, deterministic
    * sample (id-ordered limit — at 100 TB swap in TABLESAMPLE; FAISS
    * trains IVF on a sample the same way). The sample is driver-small
    * by construction (sampleN × dim doubles), the iterations run on the
    * driver in microseconds at that size, and only the k×dim centroid
    * matrix ships back into the plan as a literal — the corpus itself
    * is never collected. Centroids are L2-normalized so dot order =
    * cosine order in the assign/probe expression. Empty clusters
    * re-seed deterministically from the sample. */
  def ivfTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 8, sampleN: Int = 2048): Seq[Seq[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= nCentroids,
      s"sample (${sample.length}) smaller than nCentroids ($nCentroids)")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    // deterministic init: evenly-strided sample points
    var cents = (0 until nCentroids)
      .map(i => normalize(sample(i * sample.length / nCentroids))).toArray
    (1 to iters).foreach { _ =>
      val sums = Array.fill(nCentroids, dim)(0.0)
      val counts = new Array[Int](nCentroids)
      sample.foreach { v =>
        var best = 0; var bestS = Double.NegativeInfinity
        var c = 0
        while (c < nCentroids) {
          var s = 0.0; var i = 0
          while (i < dim) { s += v(i) * cents(c)(i); i += 1 }
          if (s > bestS) { best = c; bestS = s }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = (0 until nCentroids).map { c =>
        if (counts(c) == 0) normalize(sample(c % sample.length)) // re-seed
        else normalize(sums(c))
      }.toArray
    }
    cents.map(_.toSeq).toSeq
  }

  /** IVF-flat ANN — the classic inverted-file scale path: assign every
    * corpus vector to its nearest trained centroid (one narrow pass, no
    * shuffle), probe each query's `nProbe` nearest cells, join on the
    * cell id, and rerank candidates with exact cosine. Cost per query ≈
    * nProbe/nCentroids of the corpus instead of all of it; recall < 1
    * by construction (a true neighbor can live in an unprobed cell) —
    * raise nProbe to trade cost back for recall. The cell equi-join is
    * the same shape as [[lshTopK]]'s bucket join, so the same
    * partitioning/AQE reasoning applies at 100 TB; the corpus side
    * would be written bucketed by cell (the literal "inverted file"). */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      excludeSelf: Boolean = false,
      centroids: Option[Seq[Seq[Double]]] = None,
      roundBeforeRank: Boolean = false): DataFrame = {
    val cents = centroids.getOrElse(
      ivfTrain(corpus, idCol, vecCol, nCentroids))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell",
        element_at(nearestCentroids(col("v"), cents, 1), 1))
      .withColumn("nv", l2Norm(col("v")))
    val probes = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
      .withColumn("cell", explode(nearestCentroids(col("qv"), cents, nProbe)))
    val candRaw = c.join(probes, Seq("cell"))
    // roundBeforeRank mirrors the brute-force gate's convention (round
    // to 6 digits, THEN rank with id tie-break) so a full-probe IVF is
    // row-identical to the exact top-k and can sit under its oracle
    val rawCos = cosinePre(dot(col("v"), col("qv")), col("nv"), col("nq"))
    val cand = (if (excludeSelf) candRaw.filter(col("id") =!= col("qid")) else candRaw)
      .withColumn("cosine", if (roundBeforeRank) round(rawCos, 6) else rawCos)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    val ranked = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    if (roundBeforeRank)
      ranked.select(col("qid"), col("id"), col("cosine"), col("rank"))
    else
      ranked.select(col("qid"), col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Train PQ codebooks: per contiguous subspace, Lloyd's k-means on
    * a bounded deterministic sample (the [[ivfTrain]] discipline —
    * id-ordered limit locally, TABLESAMPLE at 100 TB; FAISS trains PQ
    * on a sample the same way). Returns M × ksub × subDim codewords;
    * only that tiny matrix ships into the encode/search plans as a
    * literal. Assignment inside training is squared-L2 argmin with
    * lower-index tie-break — the same rule [[graft.functions
    * .VectorFunctions.pqEncode]] applies, so training is just the
    * codebook PRODUCER; empty cells re-seed deterministically. */
  def pqTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 16, iters: Int = 8, sampleN: Int = 2048): Seq[Seq[Seq[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= ksub,
      s"sample (${sample.length}) smaller than ksub ($ksub)")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    (0 until m).map { mm =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, mm * subDim, (mm + 1) * subDim))
      var cents = (0 until ksub)
        .map(c => subs(c * subs.length / ksub).clone()).toArray
      (1 to iters).foreach { _ =>
        val sums = Array.fill(ksub, subDim)(0.0)
        val counts = new Array[Int](ksub)
        subs.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < ksub) {
            var s = 0.0; var i = 0
            while (i < subDim) { val d = v(i) - cents(c)(i); s += d * d; i += 1 }
            if (s < bestD) { best = c; bestD = s }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = (0 until ksub).map { c =>
          if (counts(c) == 0) subs(c % subs.length).clone() // re-seed
          else { val avg = sums(c).clone(); var i = 0
            while (i < subDim) { avg(i) /= counts(c); i += 1 }; avg }
        }.toArray
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** PQ-encode a corpus: (id, codes) with codes = M small ints — the
    * 8–32× compressed representation that makes 100 TB of embeddings
    * scannable. One narrow pass, no shuffle; write the result bucketed
    * by the coarse quantizer ([[ivfTopK]]'s cells) and you have
    * IVFADC. */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    corpus.select(col(idCol).as("id"),
      graft.functions.VectorFunctions.pqEncode(col(vecCol), codebooks).as("codes"))

  /** PQ asymmetric-distance top-k: scan the CODE table (M ints per
    * row), compute Σ per-subspace squared L2 between each broadcast
    * query and the row's codewords, keep the k smallest per query.
    * The scan never touches the raw vectors — at 100 TB the code
    * table is ~1/32 the bytes, and the per-row cost is M·subDim
    * multiply-adds inside whole-stage codegen ([[graft.functions
    * .VectorFunctions.pqAdc]]). Distances round to 6 digits BEFORE
    * ranking (id tie-break), making the whole operator relationally
    * replayable (gate t48); recall < 1 by construction (quantization
    * error) — the standard rerank is an exact pass over the top-k'
    * candidates' raw vectors, which is [[bruteForceTopK]] on the
    * k' ≪ n survivors. */
  def pqTopK(
      codes: DataFrame, idCol: String, codesCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      codebooks: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    val joined = codes.select(col(idCol).as("id"), col(codesCol).as("codes"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))))
      .withColumn("adc", round(
        graft.functions.VectorFunctions.pqAdc(col("qv"), col("codes"), codebooks), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adc"), col("rank"))
  }

  /** IVFADC — the production ANN composition (Jégou et al. TPAMI
    * 2011, §IV): a coarse quantizer routes every vector to an
    * inverted-file cell, the PQ code rides in that cell's posting
    * list, and a query scans only its `nProbe` nearest cells,
    * computing asymmetric distances against codes. At 100 TB the code
    * table is WRITTEN partitioned by cell (the literal inverted
    * file), so a probe is a partition-pruned scan of ~nProbe/nCells
    * of a corpus already 8–32× smaller than the raw vectors; here the
    * cell column is derived inline. Recall < 1 twice over (unprobed
    * cells + quantization error); full probe makes the cell structure
    * invisible — gate t50 hash-matches the flat-ADC oracle exactly
    * through the trained coarse quantizer, proving the composition
    * loses nothing — and the exact-rerank tail is [[bruteForceTopK]]
    * over the survivors. */
  def ivfadcTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      codebooks: Seq[Seq[Seq[Double]]], k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    import graft.functions.VectorFunctions
    val cents = centroids.getOrElse(ivfTrain(corpus, idCol, vecCol, nCentroids))
    val codes = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", element_at(VectorFunctions.nearestCentroids(col("v"), cents, 1), 1))
      .select(col("id"), col("cell"),
        VectorFunctions.pqEncode(col("v"), codebooks).as("codes"))
    val probes = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("cell", explode(VectorFunctions.nearestCentroids(col("qv"), cents, nProbe)))
    // each corpus row lives in exactly ONE cell, so the cell join
    // yields each (query, row) pair at most once — no dedupe needed
    val cand = codes.join(probes, Seq("cell"))
      .withColumn("adc", round(
        VectorFunctions.pqAdc(col("qv"), col("codes"), codebooks), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adc"), col("rank"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein,
    * SIGIR 1998) — greedy diverse exemplar picking: each round takes
    * the candidate maximizing `rel − λ·max_{s∈selected} sim(x, s)`,
    * trading query relevance against redundancy with what's already
    * chosen. The diverse-few-shot / dataset-diversification
    * selection step; λ=1 is pure relevance, λ→large is pure
    * diversity.
    *
    * Shape at 100 TB: each of the k rounds is one scan of the
    * candidate corpus with the ≤k selected vectors broadcast (the
    * max-sim is a partial-agg max over a k-row broadcast join) and a
    * TakeOrdered(1) pick — k scans total, the classic greedy-MMR
    * cost; batch variants (pick top-m per round) amortize scans at
    * some diversity loss. Only the k picked vectors ever reach the
    * driver. All similarities and scores round to 6 digits with id
    * tie-breaks, so the full greedy trajectory replays relationally
    * (gate t53). */
  def mmrSelect(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Float], k: Int, lambda: Double = 0.5,
      excludeIds: Seq[Long] = Nil)(
      implicit ctx: graft.operators.PipelineContext): DataFrame = {
    import graft.functions.VectorFunctions._
    require(k >= 1, "k must be positive")
    val spark = corpus.sparkSession
    val qv = typedLit(queryVec.toArray)
    val base0 = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val base = ctx.stagePersist(
      (if (excludeIds.isEmpty) base0 else base0.filter(!col("id").isin(excludeIds: _*)))
        .withColumn("nv", l2Norm(col("v")))
        .withColumn("rel", round(cosinePre(dot(col("v"), qv), col("nv"), l2Norm(qv)), 6)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
    var exhausted = false
    while (!exhausted && selected.size < k) {
      val cand = if (selected.isEmpty) base
        else base.filter(!col("id").isin(selected.map(_._1).toSeq: _*))
      val scored =
        if (selected.isEmpty) cand.withColumn("mscore", col("rel"))
        else {
          val selDf = spark.createDataFrame(
            selected.map(s => (s._1, s._2)).toSeq).toDF("sid", "sv")
            .withColumn("nsv", l2Norm(col("sv")))
          val msim = cand.crossJoin(broadcast(selDf))
            .withColumn("sim",
              round(cosinePre(dot(col("v"), col("sv")), col("nv"), col("nsv")), 6))
            .groupBy(col("id")).agg(max(col("sim")).as("msim"))
          cand.join(msim, Seq("id"))
            .withColumn("mscore", round(col("rel") - lit(lambda) * col("msim"), 6))
        }
      // candidates can run out before k (excludeIds / tiny corpora):
      // stop with the rows selected so far instead of throwing
      scored.orderBy(col("mscore").desc, col("id")).limit(1)
        .select(col("id"), col("v").cast("array<float>"), col("mscore"))
        .collect().headOption match {
        case Some(pick) =>
          selected += ((pick.getLong(0), pick.getSeq[Float](1).toArray, pick.getDouble(2)))
        case None => exhausted = true // return the rows selected so far
      }
    }
    spark.createDataFrame(
      selected.zipWithIndex.map { case ((id, _, ms), i) => (i + 1, id, ms) }.toSeq)
      .toDF("rank", "id", "mscore")
  }

  /** Cluster-assignment step (the E-step of k-means / IVF cell
    * routing, exposed as its own operator): label every vector with
    * its nearest centroid by cosine, from an arbitrary centroid TABLE
    * — embedding-space corpus clustering for mixture analysis, topic
    * balancing, or cluster-stratified sampling
    * ([[CurationPipeline.samplePerStratum]] downstream of this).
    *
    * Shape at 100 TB: the centroid side is broadcast (k rows), the
    * cosine is one codegen'd dot per (vector, centroid), and the
    * argmax is a partial aggregate `min(struct(-sim, cid))` — each
    * task reduces its rows to one candidate per vector before any
    * shuffle, so the exchange carries O(n) tiny rows. No windows.
    * Similarity is rounded to 6 digits BEFORE the argmax and ties
    * break on the smaller centroid id, making the assignment
    * engine-portable (the DuckDB oracle replays the same fold +
    * tie-break). */
  def assignToCentroids(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val c = broadcast(centroids
      .select(col(cidCol).as("__cid"), col(cvecCol).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv"))))
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", l2Norm(col("v")))
      .crossJoin(c)
      .withColumn("__sim", // + 0.0: a sim that rounds to -0.0 would
        // order below 0.0 in Spark's Double.compare but equal in IEEE
        // engines — normalize before the argmax
        round(cosinePre(dot(col("v"), col("__cv")), col("nv"), col("__cn")), 6)
          + lit(0.0))
      .groupBy(col("id"))
      .agg(min(struct((-col("__sim")).as("ns"), col("__cid").as("c"))).as("__best"))
      .select(col("id"), col("__best.c").as("cluster"),
        // + 0.0 folds the -0.0 a negated zero similarity would emit
        ((-col("__best.ns")) + lit(0.0)).as("similarity"))
  }

  /** LSH-bucketed ANN: candidates from matching BANDED sign-bit
    * buckets, with multi-probe (flip 1 bit) within each band to recover
    * near-boundary neighbors, then exact cosine rerank within
    * candidates.
    *
    * Banding (b independent hyperplane tables of p planes, per-band
    * seeds) is what makes the bucket space scale: a single 2^p table
    * has fixed key cardinality — O(n/2^p) corpus rows per probe at ANY
    * corpus size — while banding lets p grow with n (smaller buckets,
    * sub-quadratic candidates) and b buy the recall back,
    * 1-(1-r^p)^b per neighbor, like minhash banding. Degenerate corpus
    * buckets are capped via a NARROW (band,bucket) count (vectors are
    * not shuffled for sizing) and dropped — bounded candidates beat a
    * whale bucket; raise maxBucket if recall matters more than tail
    * latency. */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nPlanes: Int = 8, bands: Int = 4,
      maxBucket: Int = 10000,
      excludeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", l2Norm(col("v")))
      .select(col("id"), col("v"), col("nv"),
        posexplode(array((0 until bands).map(bd =>
          lshBucket(col("v"), dim, nPlanes, seed = 42L + bd)): _*))
          .as(Seq("band", "bucket")))
    val okBuckets = c.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket)
      .select(col("band"), col("bucket"))
    val capped = c.join(okBuckets, Seq("band", "bucket"), "left_semi")
    val qBase = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
    // per band: the query's own bucket plus each 1-bit flip
    val probes = qBase
      .select(col("qid"), col("qv"), col("nq"),
        posexplode(array((0 until bands).map(bd =>
          lshBucket(col("qv"), dim, nPlanes, seed = 42L + bd)): _*))
          .as(Seq("band", "qbucket")))
      .withColumn("bucket",
        explode(array(
          (col("qbucket") +: (0 until nPlanes).map(i =>
            col("qbucket").bitwiseXOR(shiftleft(lit(1L), i)))): _*)))
      .select(col("qid"), col("qv"), col("nq"), col("band"), col("bucket"))
    // a (qid,id) pair can collide in several bands — dedupe BEFORE
    // ranking or one corpus id burns multiple ranks (duplicate rows
    // carry identical vector payloads, so keeping any one is exact)
    val candRaw = capped.join(probes, Seq("band", "bucket"))
      .dropDuplicates("qid", "id")
    // self-exclusion must precede ranking or rank 1 is burned on the
    // query's own vector (rank gaps + k-1 usable neighbors)
    val cand = (if (excludeSelf) candRaw.filter(col("id") =!= col("qid")) else candRaw)
      .withColumn("cosine", cosinePre(dot(col("v"), col("qv")), col("nv"), col("nq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
