package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Deduplication for training-data pipelines, exact → fuzzy:
  *
  *  - exact: hash-groupBy (one shuffle on the content hash);
  *  - MinHash+LSH: shingle → k-perm signature → band buckets →
  *    same-bucket candidate join → optional exact-Jaccard verify;
  *  - SimHash: 64-bit signature → C(maxHamming+2, 2) chunk-PAIR
  *    buckets (pigeonhole: hamming ≤ maxHamming ⇒ ≥2 clean chunks ⇒
  *    at least one identical pair key, so signature-space recall is
  *    1) → verify hamming; pairs → [[componentsOf]] for clusters;
  *  - n-gram Jaccard: exact set similarity, LSH-bounded candidates;
  *  - embedding cosine: sign-bit LSH buckets → cosine verify.
  *
  * Scale design:
  *  - no operator materializes the O(n²) pair space — candidates come
  *    from equi-joins on bucket keys (shuffles partitioned by bucket);
  *  - signatures are computed ONCE — explode → partial-aggregated
  *    groupBy (map-side combine) — and the signature table is staged
  *    via the caller's [[PipelineContext]] before it fans out into the
  *    band explode and both sides of the candidate join; without that
  *    every branch would recompute the k-hash signature expression
  *    (measured 60× slowdown at k=64). Staging is a LAZY
  *    `localCheckpoint` owned by the [[PipelineContext]]: columnar
  *    `persist()` measured 2-3× slower end-to-end on these pipelines
  *    (round-4 profile: t13 8.6 s persisted vs 4.4 s checkpointed),
  *    while the context tracks each checkpoint's backing RDD and frees
  *    its blocks after the consuming action, so a long-lived serving
  *    driver retains nothing between queries. For reuse ACROSS
  *    pipeline runs the signature/band-key/shingle-set tables are a
  *    persisted index — [[graft.storage.MinHashIndex]] (admission,
  *    corpus-wide pairs, membership, takedowns); these inline forms
  *    are the one-shot engines it is differentially pinned against;
  *  - join strategy is left to AQE: the per-document side tables
  *    (signatures, shingle sets, sizes) come out of shuffles, so AQE
  *    has exact runtime sizes and picks broadcast-hash exactly when a
  *    side actually fits — a static hint would either force a driver
  *    OOM at the 100 TB design point or (threshold-guarded) need an
  *    eager count(), reintroducing the blocking jobs;
  *  - skewed buckets (a shingle-free short doc, a zero vector) are
  *    capped via `maxBucket` (log-and-drop, the standard web-dedup
  *    trade); AQE skew-join splitting handles the moderate skew below
  *    the cap. */
object Dedup {

  /** Unambiguous multi-column content hash: a separator prevents
    * ("ab","c") colliding with ("a","bc"), and a null marker prevents
    * null colliding with empty string (concat_ws skips nulls). */
  private def contentHash(contentCols: Seq[String]): Column =
    md5(concat_ws("|", contentCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000NULL"))): _*))

  /** Exact duplicate groups by md5 of the content columns. */
  def exactGroups(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.withColumn("content_hash", contentHash(contentCols))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  /** Keep exactly one row per content hash (deterministic: min id). */
  def exactDedup(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val h = contentHash(contentCols)
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Shingle granularity: character n-grams (robust to any text, but
    * low-entropy on small-vocabulary corpora) vs word n-grams (far more
    * discriminative when texts tokenize — collapses the LSH candidate
    * space by orders of magnitude on word-salad-like data). */
  sealed trait ShingleMode
  final case class CharGrams(n: Int) extends ShingleMode
  final case class WordGrams(n: Int) extends ShingleMode

  /** (id, shingle-hash) rows via pure codegen operators — explode the
    * position range, `substr`/`slice` (column args, codegen'd), hash to
    * long. No higher-order functions: the lambda-based `transform`
    * shingler is interpreted per element and measured ~10× slower.
    * Duplicate shingles are kept: min over a multiset equals min over
    * the set, and the Jaccard stage collects sets itself. */
  private[graft] def shingleHashes(
      df: DataFrame, idCol: String, textCol: String,
      mode: ShingleMode): DataFrame = (mode match {
    case CharGrams(n) =>
      df.select(col(idCol).as("id"), lower(trim(col(textCol))).as("t"))
        .filter(length(col("t")) >= n)
        .select(col("id"),
          explode(sequence(lit(0), length(col("t")) - n)).as("i"),
          col("t"))
        .select(col("id"),
          xxhash64(substr(col("t"), col("i") + 1, lit(n))).as("h"))
    case WordGrams(n) =>
      df.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
        .filter(size(col("w")) >= n)
        .select(col("id"),
          explode(sequence(lit(1), size(col("w")) - (n - 1))).as("i"),
          col("w"))
        .select(col("id"),
          xxhash64(concat_ws(" ", slice(col("w"), col("i"), lit(n)))).as("h"))
  })

  /** MinHash signatures as one exploded aggregation: k min-hashes per
    * doc in a single shuffle with map-side partial mins. Each shingle
    * is hashed ONCE to a long; the k permutations re-hash the
    * fixed-width long (seeded XXH64) — string traversal does not
    * multiply by k. The signature is ONE native aggregate column
    * ([[graft.functions.SketchFunctions.minhashSig]]): the previous
    * k-column `min(xxhash64(h, i))` form made Catalyst planning scale
    * with k (~2.5 s driver time per pipeline call at k=64). */
  private[graft] def minhashSigs(hashes: DataFrame, numHashes: Int)(
      implicit ctx: PipelineContext): DataFrame =
    ctx.stage(hashes.groupBy(col("id"))
      .agg(graft.functions.SketchFunctions.minhashSig(col("h"), numHashes).as("sig")))

  /** LSH band keys (id, band, bh) from a signature table — xxhash64 of
    * each band's signature slice. ONE definition shared by the
    * self-pair, cross-corpus and persisted-index engines so every
    * caller buckets identically (a divergent band hash would silently
    * zero the persisted index's recall against the inline forms). */
  private[graft] def bandKeys(
      sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(
      col("id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate pairs (id1 < id2) from a banded table — ONE definition
    * of the bucket-cap + pair-generation discipline, shared by
    * [[minhashPairs]] and the persisted index's
    * [[graft.storage.MinHashIndex.selfPairs]] (like [[bandKeys]]: a
    * divergent copy would silently change recall in one engine only).
    * Bucket sizes come from a window count (sort-based, spillable)
    * BEFORE any array materializes — a degenerate bucket (millions of
    * boilerplate docs sharing one band signature) inside a
    * collect_list buffer would be an unspillable whale array — and
    * only surviving buckets aggregate; the groupBy keys equal the
    * window partition keys, so the aggregation reuses the window's
    * hash partitioning (no second shuffle). Pairs explode positionally
    * from the sorted per-bucket array (id2 drawn from the suffix after
    * id1 — each unordered pair once, id1 < id2): no bucket self-join. */
  private[graft] def bandedPairCandidates(
      banded: DataFrame, maxBucket: Int): DataFrame = {
    val sized = banded.withColumn("bn",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bn").between(2, maxBucket))
    sized.groupBy(col("band"), col("bh"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
      .select(col("id1"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id2"))
      .distinct()
  }

  /** MinHash+LSH near-duplicate candidate pairs (id1 < id2), optionally
    * verified with exact Jaccard over the shingle sets. `bands` must
    * divide `numHashes`; collision probability ≈ 1-(1-j^r)^b. */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = CharGrams(5), numHashes: Int = 64, bands: Int = 16,
      minJaccard: Option[Double] = None,
      maxBucket: Int = 500)(implicit ctx: PipelineContext): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // staged here, not inside shingleHashes: THIS caller fans the hash
    // table into sigs + the exact-verify stage; single-consumer callers
    // (jaccardPairsExact stages its own distinct) must not pay a
    // second block copy
    val hashes = ctx.stage(shingleHashes(df, idCol, textCol, shingle))
    val sigs = minhashSigs(hashes, numHashes)
    val banded = bandKeys(sigs, numHashes, bands)
    val cand = bandedPairCandidates(banded, maxBucket)
    minJaccard match {
      case None => cand
      case Some(j) =>
        // Two-stage verify: (1) estimate Jaccard from the (small)
        // signatures — matching components / k, sd ≈ √(j(1−j)/k) — and
        // discard clearly-below-threshold pairs WITHOUT ever shipping
        // the shingle arrays; (2) exact Jaccard on the survivors only.
        // On a self-similar corpus the candidate set is O(n²)-ish, so
        // stage 1 is what keeps the shuffle volume bounded.
        val estMargin = 2.0 * math.sqrt(j * (1 - j) / numHashes)
        val sig1 = sigs.withColumnsRenamed(Map("id" -> "id1", "sig" -> "sig1"))
        val sig2 = sigs.withColumnsRenamed(Map("id" -> "id2", "sig" -> "sig2"))
        // codegen'd estimate: one native loop expression (zip_with is
        // interpreted — measured 5× slower; the unrolled element_at
        // chain planned in O(k) optimizer width)
        val matches = graft.functions.SketchFunctions.matchCount(
          col("sig1"), col("sig2"))
        // join strategy: AQE (see object scaladoc) — no static hints
        val estimated = ctx.stage(cand
          .join(sig1, Seq("id1"))
          .join(sig2, Seq("id2"))
          .withColumn("est", matches.cast("double") / numHashes)
          .filter(col("est") >= j - estMargin)
          .select("id1", "id2"))
        // exact shingle sets only for the surviving docs (semi join),
        // reusing the codegen'd hash rows — Jaccard over 64-bit shingle
        // hashes is exact modulo negligible collision probability
        // semi consumer — duplicates are free, the distinct was a
        // whole extra exchange (r18, §2.4)
        val survivorIds = estimated.select(col("id1").as("id"))
          .union(estimated.select(col("id2").as("id")))
        val sh = hashes.join(survivorIds, Seq("id"), "left_semi")
          .groupBy(col("id")).agg(collect_set(col("h")).as("shingles"))
        estimated
          .join(sh.withColumnsRenamed(Map("id" -> "id1", "shingles" -> "sh1")), Seq("id1"))
          .join(sh.withColumnsRenamed(Map("id" -> "id2", "shingles" -> "sh2")), Seq("id2"))
          .withColumn("jaccard",
            size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              size(array_union(col("sh1"), col("sh2"))))
          .filter(col("jaccard") >= j)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
    }
  }

  /** Incremental corpus dedup: drop incoming rows that duplicate the
    * EXISTING corpus — exact (content hash anti-join) then near
    * (banded minhash collision with an existing doc, verified by
    * exact Jaccard ≥ `minJaccard`). The continuous-refresh operator: a
    * new crawl/batch is admitted against yesterday's corpus without
    * re-deduping the corpus against itself.
    *
    * Scale shape — the point of a dedicated cross form: candidates
    * come ONLY from incoming×existing band-bucket equi-joins, never
    * existing×existing (at 100 TB the existing corpus dwarfs every
    * increment; a union self-join would spend almost all its work
    * re-pairing old docs). Signatures are computed per side with the
    * same staged explode→partial-agg as [[minhashPairs]]; whale
    * buckets are capped on the EXISTING side (the unbounded one) via
    * the same spillable window count; the two-stage verify (signature
    * estimate prefilter → exact Jaccard on survivors) keeps shingle
    * arrays off the wire for clearly-false candidates. At corpus scale
    * the existing side's signatures/banded table should be a persisted
    * index, bucketed by (band, bucket-hash), amortized across
    * increments — [[graft.storage.MinHashIndex]] IS that index (its
    * `dedupAgainst` is result-identical to this one by differential
    * spec); this inline form remains the right call for one-shot
    * corpus-vs-corpus jobs where nothing is reused.
    * Within-incoming duplicates are NOT collapsed here —
    * run [[exactDedup]]/[[minhashPairs]] on the increment first;
    * composing the two keeps each operator's semantics testable.
    * Ids must be unique across BOTH tables. */
  def dedupAgainst(
      incoming: DataFrame, existing: DataFrame,
      idCol: String, textCol: String,
      shingle: ShingleMode = CharGrams(5), numHashes: Int = 64,
      bands: Int = 16, minJaccard: Double = 0.5,
      maxBucket: Int = 500)(implicit ctx: PipelineContext): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // exact stage: one anti-join on the content hash (existing side
    // reduced to distinct hashes — AQE broadcasts when it fits)
    val exHash = existing
      .select(md5(col(textCol).cast("string")).as("__exh")).distinct()
    val exactSurvivors = ctx.stage(incoming
      .withColumn("__h", md5(col(textCol).cast("string")))
      .join(exHash, col("__h") === col("__exh"), "left_anti")
      .drop("__h"))

    def banded(sigs: DataFrame): DataFrame = bandKeys(sigs, numHashes, bands)

    val inHashes = ctx.stage(shingleHashes(exactSurvivors, idCol, textCol, shingle))
    val exHashes = ctx.stage(shingleHashes(existing, idCol, textCol, shingle))
    val inSigs = minhashSigs(inHashes, numHashes)
    val exSigs = minhashSigs(exHashes, numHashes)
    // cap existing-side whale buckets BEFORE the join (window count is
    // sort-based/spillable, same rationale as minhashPairs)
    val exBanded = banded(exSigs)
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bn") <= maxBucket)
      .select(col("id").as("ex_id"), col("band"), col("bh"))
    val cand = banded(inSigs)
      .join(exBanded, Seq("band", "bh"))
      .select(col("id"), col("ex_id")).distinct()
    // two-stage verify, as in minhashPairs
    val estMargin = 2.0 * math.sqrt(minJaccard * (1 - minJaccard) / numHashes)
    val estimated = ctx.stage(cand
      .join(inSigs.withColumnsRenamed(Map("sig" -> "sig1")), Seq("id"))
      .join(exSigs.withColumnsRenamed(Map("id" -> "ex_id", "sig" -> "sig2")), Seq("ex_id"))
      .withColumn("est",
        graft.functions.SketchFunctions.matchCount(col("sig1"), col("sig2"))
          .cast("double") / numHashes)
      .filter(col("est") >= minJaccard - estMargin)
      .select(col("id"), col("ex_id")))
    // semi/anti consumers need no distinct probe sides (r18, §2.4)
    val inSh = inHashes
      .join(estimated.select(col("id")), Seq("id"), "left_semi")
      .groupBy(col("id")).agg(collect_set(col("h")).as("sh1"))
    val exSh = exHashes
      .join(estimated.select(col("ex_id").as("id")), Seq("id"), "left_semi")
      .groupBy(col("id")).agg(collect_set(col("h")).as("sh2"))
    val dropIds = estimated
      .join(inSh, Seq("id"))
      .join(exSh.withColumnsRenamed(Map("id" -> "ex_id")), Seq("ex_id"))
      .filter(
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))) >= minJaccard)
      .select(col("id"))
    exactSurvivors.join(dropIds,
      exactSurvivors(idCol) === dropIds("id"), "left_anti")
  }

  /** SimHash-64 per doc via one exploded aggregation: per-bit ±1 sums
    * with map-side combine, then bits assembled from the sign — all
    * inside ONE native aggregate column (the 64-sum form paid O(64)
    * planning width per call; same token hashes, same signatures). */
  private def simhashSigs(
      df: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column)(
      implicit ctx: PipelineContext): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .select(col("id"), explode(col("t")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    // narrow (id, long) frame: columnar persist beats checkpoint here
    ctx.stagePersist(exploded.groupBy(col("id"))
      .agg(graft.functions.SketchFunctions.simhashSig(col("h")).as("sim")))
  }

  /** SimHash near-duplicate pairs with hamming ≤ maxHamming (default 3).
    *
    * Bucketing uses CHUNK-PAIR keys over `maxHamming + 2` chunks: by
    * pigeonhole, a pair differing in ≤ maxHamming bits dirties at most
    * maxHamming chunks, leaving ≥ 2 clean chunks — so at least one
    * (i,j) chunk PAIR is identical on both sides and signature-space
    * recall stays exactly 1. The pair keys are what make this scale:
    * single-chunk keys at maxHamming=6 are ~9 bits wide (≤512 distinct
    * values — the bucket join admits O(n²/512) candidates at ANY corpus
    * size), while C(8,2)=28 concatenated 16-bit pair keys grow the key
    * space to ~65k per slot, shrinking per-bucket collision mass ~128×.
    * The explode factor rises from maxHamming+1 to C(maxHamming+2,2) —
    * rows are 4 narrow columns, a cheap trade for de-quadratified
    * candidates.
    *
    * Candidate generation replicates [[minhashPairs]]' capped shape:
    * bucket sizes come from a window count BEFORE any array
    * materializes, degenerate buckets (> maxBucket boilerplate docs
    * sharing 16 signature bits) are dropped — the standard web-dedup
    * log-and-drop trade — and pairs posexplode positionally from the
    * sorted per-bucket array (each unordered pair once, id1 < id2), so
    * there is no bucket self-join at all. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 2000,
      tokenHash: Column => Column = xxhash64(_))(
      implicit ctx: PipelineContext): DataFrame =
    simhashCandidates(df, idCol, textCol, maxHamming, maxBucket, tokenHash)
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** The candidate stage of [[simhashPairs]] (pre-verify, may contain
    * bucket-level duplicates) — exposed inside graft so scale tests can
    * assert candidate volume grows sub-quadratically with the corpus. */
  private[graft] def simhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucket: Int,
      tokenHash: Column => Column = xxhash64(_))(
      implicit ctx: PipelineContext): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32), got $maxHamming")
    val nChunks = maxHamming + 2
    // chunk i covers bits [i*64/n, (i+1)*64/n) — widths differ by ≤1
    // and are ≤ 32 (nChunks ≥ 2), so two chunk values pack losslessly
    // into one long as (cvI << 32) | cvJ.
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    def chunkVal(i: Int): Column = {
      val lo = bounds(i); val w = bounds(i + 1) - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(col("sim"), lo).bitwiseAND(mask)
    }
    val pairKeys = for {
      i <- 0 until nChunks; j <- (i + 1) until nChunks
    } yield struct(
      lit(i * nChunks + j).as("ck"),
      shiftleft(chunkVal(i), 32).bitwiseOR(chunkVal(j)).as("cv"))
    val sigs = simhashSigs(df, idCol, textCol, tokenHash)
    val chunked = sigs.select(col("id"), col("sim"),
      explode(array(pairKeys: _*)).as("ch"))
      .select(col("id"), col("sim"), col("ch.ck").as("ck"), col("ch.cv").as("cv"))
    // cap before collect_list — the window count is sort-based and
    // spillable; the groupBy reuses the window's hash partitioning
    val sized = chunked.withColumn("bn",
      count(lit(1)).over(Window.partitionBy(col("ck"), col("cv"))))
      .filter(col("bn").between(2, maxBucket))
    val buckets = sized.groupBy(col("ck"), col("cv"))
      .agg(array_sort(collect_list(struct(col("id"), col("sim")))).as("xs"))
    buckets
      .select(col("xs"), posexplode(col("xs")).as(Seq("i", "x1")))
      .select(col("x1"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs")))).as("x2"))
      .select(col("x1.id").as("id1"), col("x2.id").as("id2"),
        hamming64(col("x1.sim"), col("x2.sim")).as("hamming"))
  }

  /** Exact n-gram Jaccard similarity pairs ≥ threshold; candidates
    * LSH-bounded via minhash banding (never all-pairs). Probabilistic
    * recall (banding can miss a threshold-grazing pair) — use
    * [[jaccardPairsExact]] when the output must be deterministic. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = CharGrams(3), minJaccard: Double = 0.5)(
      implicit ctx: PipelineContext): DataFrame =
    minhashPairs(df, idCol, textCol, shingle,
      numHashes = 64, bands = 32, minJaccard = Some(minJaccard))

  /** EXACT n-gram Jaccard pairs via an inverted-index join — the
    * deterministic (non-LSH) scale path: explode distinct shingles,
    * self-join on the shingle, count common shingles per pair
    * (map-side partial agg), then |A∩B|/(|A|+|B|−|A∩B|). Every pair
    * sharing ≥1 shingle is scored, so recall is 1 by construction —
    * unlike banding there is no probabilistic miss. Candidate volume is
    * Σ_shingle df², cut per row by the PPJoin SIZE filter (see below);
    * for the full prefix+positional stack use [[jaccardPairsPrefix]]. */
  def jaccardPairsExact(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = WordGrams(2), minJaccard: Double = 0.5,
      maxCandidatesPerBlock: Long = 1000000000L)(
      implicit ctx: PipelineContext): DataFrame = {
    // distinct (id, shingle-hash) widened with the per-doc set size:
    // Jaccard is over shingle SETS; staged — feeds the volume probe
    // and both join sides, and `sz` rides along so the size filter is
    // checkable on each candidate row (the end-of-plan sizes join
    // can't help there — it sits after the pair aggregation)
    val sh = ctx.stage(shingleHashes(df, idCol, textCol, shingle).distinct()
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("id")))))
    def pairCounts(s: DataFrame, parts: Option[Int]): DataFrame = {
      val cand = s.select(col("h"), col("id").as("id1"), col("sz").as("sz1"))
        .join(s.select(col("h"), col("id").as("id2"), col("sz").as("sz2")),
          Seq("h"))
        .filter(col("id1") < col("id2"))
        // PPJoin size filter (Xiao et al. §3, ported from
        // [[jaccardPairsPrefix]] — VERDICT r13 #1): J ≥ t forces
        // min(|A|,|B|) ≥ t·max(|A|,|B|), checkable on the candidate
        // row itself, so size-incompatible pairs die BEFORE the
        // pair-key shuffle the segmentation below exists to survive.
        // +1e-9 leans KEEP: IEEE rounding can only admit extra
        // candidates, never drop a boundary pair — recall stays 1.
        .filter(least(col("sz1"), col("sz2")).cast("double") + lit(1e-9) >=
          lit(minJaccard) * greatest(col("sz1"), col("sz2")))
        .select(col("id1"), col("id2"))
      // `parts` (segmented path only) re-keys the candidate stream on
      // the PAIR before aggregating: many small agg partitions instead
      // of 32 huge ones, so per-task hash-agg state stays ~4 M keys —
      // the local 8 GB heap's survival margin; a cluster gets the same
      // effect from AQE over real executor memory
      val shaped = parts.map(p => cand.repartition(p, col("id1"), col("id2")))
        .getOrElse(cand)
      shaped.groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("c"))
    }
    // Candidate volume is Σ_gram df² — measured up front (one
    // partial-agg pass over the staged table). Within one block's
    // budget the whole join+pair-agg runs as a single plan, identical
    // to before. Past it, the GRAM POSTINGS ARE SEGMENTED: grams are
    // hash-assigned to ⌈Σdf²/budget⌉ blocks (xxhash64 keys spread
    // Σdf² evenly absent single-gram whales), each block's candidate
    // join + partial pair-counts run as a SEQUENTIAL job landing in a
    // context-owned parquet scratch dir, and a final sum-agg
    // reassembles c(pair) = Σ_block c_block(pair) — each gram lives in
    // exactly one block, so the result is IDENTICAL by construction
    // (PropertySpec pins it). That bounds peak working set to one
    // block regardless of corpus entropy: the r7 ScaleCheck 64× tier
    // (4.7 B candidates) heap-killed one 8 GB JVM as a single plan and
    // completes segmented. The gram table itself moves from the
    // row-block checkpoint to columnar scratch parquet for the block
    // loop — at 64× the resident deserialized blocks (~11 GB of row
    // objects under a 4.6 GB storage pool) are their own heap hazard,
    // while parquet pages stream through bounded read buffers. The
    // residual: one gram whose own df² exceeds the budget can't be
    // split by gram blocking — that's the operator's documented floor
    // (route θ≥0.7 to [[jaccardPairsPrefix]], which drops exactly
    // those whales, or [[jaccardPairs]] LSH).
    val volume = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(col("df") * col("df")), lit(0L)).as("v"))
      .collect()(0).getLong(0)
    val rowGroup = (8 << 20).toString // small groups: 32 concurrent
    // vectored readers buffer whole row groups on heap (observed 64×
    // OOM site at the 128 MB default)
    // pair-agg parallelism from the measured candidate volume: ~600 k
    // candidate rows per task (the sf0.1 sweep's optimum — 32 native
    // partitions ran 14.5 s, 128 ran 10.2 s, 256 overshot to 15.6 s);
    // more partitions shrink per-task agg state, fewer amortize task
    // overhead, and volume/600 k holds per-task load constant as the
    // corpus grows
    def aggPartsFor(cand: Long): Int =
      math.min(2048L, math.max(32L, cand / 600000L)).toInt
    val (grams, common) =
      if (volume <= maxCandidatesPerBlock)
        (sh, pairCounts(sh, Some(aggPartsFor(volume))))
      else {
        val nBlocks = math.min(4096L,
          (volume + maxCandidatesPerBlock - 1) / maxCandidatesPerBlock).toInt
        // segmented-block agg sizing: ~2 M candidate rows per task.
        // The earlier 4 M/task sizing put 32 concurrent tasks × 4 M
        // pair keys ≈ the whole 8 GB heap in agg state — the r12 full
        // 16×-sweep OOMed exactly there (1.17 B candidates, 2 blocks,
        // 146 partitions) on a loaded box; 2 M/task halves peak state
        // for one more round of task overhead, which the block loop —
        // memory-bound, not task-overhead-bound — doesn't notice
        val aggParts = math.min(4096L,
          math.max(64L, volume / nBlocks / 2000000L)).toInt
        println(s"JEXACT segmenting gram postings: $volume candidates " +
          s"> $maxCandidatesPerBlock budget -> $nBlocks sequential " +
          s"blocks, $aggParts agg partitions")
        val dir = ctx.scratchDir("graft-jexact")
        sh.write.option("parquet.block.size", rowGroup).parquet(s"$dir/sh")
        ctx.unstage(sh) // checkpoint blocks freed; shD replaces it
        val shD = df.sparkSession.read.parquet(s"$dir/sh")
        (0 until nBlocks).foreach { i =>
          pairCounts(shD.filter(pmod(col("h"), lit(nBlocks)) === i), Some(aggParts))
            .write.option("parquet.block.size", rowGroup)
            .mode("append").parquet(s"$dir/pc")
        }
        (shD, df.sparkSession.read.parquet(s"$dir/pc")
          .repartition(aggParts, col("id1"), col("id2"))
          .groupBy(col("id1"), col("id2")).agg(sum(col("c")).as("c")))
      }
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    // no broadcast hint on `sizes`: it has one row PER DOCUMENT, so a
    // forced broadcast is a guaranteed driver OOM at the 100 TB design
    // point. `sizes` comes out of a shuffle, so AQE has exact runtime
    // stats and picks broadcast-hash itself whenever it actually fits.
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id1", "sz" -> "sz1")), Seq("id1"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id2", "sz" -> "sz2")), Seq("id2"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** PREFIX-FILTERED exact n-gram Jaccard pairs — [[jaccardPairsExact]]
    * with the full AllPairs/PPJoin filter stack (Xiao et al., "Efficient
    * Similarity Joins for Near Duplicate Detection"), still recall 1:
    *
    *  1. TWO-SIDED prefix join. For J(A,B) ≥ t the required overlap is
    *     α = ⌈t/(1+t)·(|A|+|B|)⌉, and with the size filter (|B| ≥ t·|A|)
    *     α ≥ ⌈t·|x|⌉ for BOTH sides, so the (|x|−α+1)-prefixes — the
    *     ⌊(1−t)·|x|⌋+1 rarest grams under the global (df, h) total
    *     order — of A and B must SHARE a gram (the prefix-filtering
    *     principle). Candidates therefore come from the prefix index
    *     self-joined against itself, not against the full gram table:
    *     the probe side shrinks from |x| to (1−t)·|x|+1 grams per doc.
    *  2. SIZE filter at join-row level: J ≥ t forces
    *     min(|A|,|B|) ≥ t·max(|A|,|B|) — pairs violating it die before
    *     the pair aggregation ever shuffles them.
    *  3. POSITIONAL filter per pair: both docs rank grams by the SAME
    *     (df, h) total order, so among a pair's matching prefix rows
    *     the row minimizing rn1 also minimizes rn2 (order-agreement).
    *     For that first shared prefix gram at positions (p1, p2),
    *     shared grams before it number ≤ min(p1,p2)−1 and after it
    *     ≤ min(|A|−p1, |B|−p2), so
    *     overlap ≤ min(p1,p2) + min(|A|−p1, |B|−p2); pairs whose bound
    *     sits below α never reach the array-intersect verify. This is
    *     the filter that kills the dense-corpus candidate whales: two
    *     docs sharing only COMMON grams match late in both prefixes and
    *     prune here without touching their full gram sets.
    *
    * The exact intersection is then recomputed per surviving candidate
    * over the full sets — output identical to [[jaccardPairsExact]] by
    * construction (PipelineSpec pins the equivalence; PropertySpec
    * differentials it against brute force at t ∈ {0.3, 0.6, 0.9}).
    * All ε-guards lean KEEP (longer prefix, looser bound), so IEEE
    * rounding can only admit extra candidates, never drop a true pair.
    *
    * What it buys at 100 TB: the inverted index drops each document's
    * commonest grams — exactly the Σ df² whales — keeping only
    * (1−t)·|A|+1 rare grams per doc, and the candidate join volume is
    * now quadratic in the PREFIX postings, not one-sided-linear in the
    * full postings. Pays at t ≥ ~0.7; at t = 0.4 the prefixes keep
    * most grams — use [[jaccardPairs]] (LSH) there (SCALING.md
    * "Jaccard engines"). The df computation and per-doc rank are one
    * agg + one bounded window (docs are bounded size); no global gram
    * sort is needed because (df, h) is itself the total order. */
  def jaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = WordGrams(2), minJaccard: Double = 0.7)(
      implicit ctx: PipelineContext): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "prefix filtering needs a threshold in (0, 1]")
    val sh = ctx.stage(shingleHashes(df, idCol, textCol, shingle).distinct())
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // AQE picks broadcast for dfreq when it fits (same policy note as
    // jaccardPairsExact's sizes join: one row per DISTINCT gram, no
    // forced broadcast)
    val ranked = sh.join(dfreq, Seq("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("id"))))
    // +1e-9 before floor: (1−t)·sz can land an ULP under its exact
    // value (0.3·10 = 2.999…96 would floor to 2, not 3) — a too-short
    // prefix breaks recall, a one-longer prefix only costs candidates
    val prefix = ctx.stage(ranked
      .filter(col("rn") <=
        floor(lit(1.0 - minJaccard) * col("sz") + lit(1e-9)) + lit(1))
      .select(col("h"), col("id"), col("rn"), col("sz")))
    // two-sided prefix self-join; id1 < id2 directly (the match-row set
    // is symmetric, so each unordered pair appears exactly once per
    // shared prefix gram) + the size filter before any shuffle
    val matches = prefix
      .select(col("h"), col("id").as("id1"), col("rn").as("rn1"),
        col("sz").as("sz1"))
      .join(prefix.select(col("h"), col("id").as("id2"),
        col("rn").as("rn2"), col("sz").as("sz2")), Seq("h"))
      .filter(col("id1") < col("id2"))
      .filter(least(col("sz1"), col("sz2")).cast("double") + lit(1e-9) >=
        lit(minJaccard) * greatest(col("sz1"), col("sz2")))
    // per-pair first shared prefix gram (min rn on both sides — same
    // row by order-agreement), then the positional overlap bound
    val alpha = lit(minJaccard / (1.0 + minJaccard))
    val cand = matches
      .groupBy(col("id1"), col("id2"))
      .agg(min(col("rn1")).as("p1"), min(col("rn2")).as("p2"),
        first(col("sz1")).as("sz1"), first(col("sz2")).as("sz2"))
      .filter((least(col("p1"), col("p2")) +
        least(col("sz1") - col("p1"), col("sz2") - col("p2")))
        .cast("double") + lit(1e-9) >= alpha * (col("sz1") + col("sz2")))
      .select(col("id1"), col("id2"))
    // verify PPJoin-style: per-pair O(|A|+|B|) via native
    // array_intersect over each doc's gram-set array (bounded per doc)
    // — NOT a re-join against the exploded gram table, whose volume is
    // Σ_cand |A| and would dwarf the candidate cut on dense corpora
    val sets = ctx.stage(sh.groupBy(col("id"))
      .agg(collect_list(col("h")).as("hs")))
    cand
      .join(sets.select(col("id").as("id1"), col("hs").as("hs1")), Seq("id1"))
      .join(sets.select(col("id").as("id2"), col("hs").as("hs2")), Seq("id2"))
      .withColumn("c", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("hs1")) + size(col("hs2")) - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- Jaccard-family auto-routing ---------------------------------------

  /** Which Jaccard engine the router chose (spec surface — the pure
    * decision is pinnable without running a corpus). */
  sealed trait JaccardRoute
  object JaccardRoute {
    /** [[jaccardPairsExact]]: recall 1, cost ∝ Σ df² — the default
      * whenever the inverted index fits one segment budget. */
    case object Exact extends JaccardRoute
    /** [[jaccardPairsPrefix]]: recall 1, drops each doc's commonest
      * grams — the Σ df² whales — but only pays at high θ (measured:
      * 1.8× cut at θ=0.4 vs super-proportional at θ≥0.7). */
    case object Prefix extends JaccardRoute
    /** [[minhashPairs]]: sub-quadratic at ANY θ but probabilistic —
      * banding tuned so the S-curve midpoint (1/bands)^(rows⁻¹) sits
      * at or below θ (recall-leaning). */
    final case class Lsh(numHashes: Int, bands: Int) extends JaccardRoute
  }

  /** One-pass corpus profile over the distinct (doc, gram) table:
    * `candVolume` = Σ df² is exactly the candidate-row count the
    * inverted-index self-join would produce — the number that decides
    * everything. `postings` = Σ df (the table's row count, an upper
    * bound on doc count). */
  final case class JaccardProfile(postings: Long, nGrams: Long, candVolume: Long)

  /** The profile scan: tokenize+shingle → distinct → one two-level
    * agg. O(corpus scan) — at 100 TB this pass is amortized against
    * choosing a wrongly-routed engine that runs hours longer (or
    * silently under-recalls). */
  def jaccardProfile(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = WordGrams(2)): JaccardProfile = {
    val r = shingleHashes(df, idCol, textCol, shingle).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("g"),
        coalesce(sum(col("df") * col("df")), lit(0L)).as("v"),
        coalesce(sum(col("df")), lit(0L)).as("p"))
      .collect()(0)
    // an exact doc count would be a second distinct pass — the routing
    // thresholds only need Σ df², so the postings total suffices
    JaccardProfile(r.getLong(2), r.getLong(0), r.getLong(1))
  }

  /** The routing decision, pure in the profile:
    *  1. θ ≥ 0.3 AND the prefix join's own volume BOUND —
    *     (1−θ)²·Σdf², the two-sided prefix index self-joined — fits
    *     the budget → PREFIX (recall 1). The round-13 PPJoin upgrade
    *     (two-sided join + size + positional filters) moved this
    *     boundary: measured on the dense sf0.1 corpus
    *     (`graft.tools.JaccardRegimes`), prefix now beats exact at
    *     EVERY threshold — 8.9→6.8 s at θ=0.3, 8.4→2.8 s at θ=0.7 —
    *     where the old one-sided filter only paid at θ ≥ ~0.65. The
    *     θ ≥ 0.3 floor keeps the near-degenerate regime (prefix ≈
    *     whole doc, filters toothless, rank window pure overhead) on
    *     the count-aggregation engine.
    *  2. else Σ df² within one exact-segment budget → EXACT (recall 1,
    *     no pre-filter machinery to pay for);
    *  3. else θ ≥ 0.65 → PREFIX regardless of the bound (still
    *     recall 1; the measured cut at high θ is super-proportional —
    *     rare grams have small df — so the static (1−θ)² bound is
    *     very pessimistic exactly here);
    *  4. else → LSH (the only sub-quadratic option at low θ;
    *     recall < 1 and the router says so loudly). */
  private[graft] def jaccardRouteFor(
      p: JaccardProfile, minJaccard: Double,
      exactBudget: Long = 1000000000L): JaccardRoute = {
    val prefVolume =
      ((1.0 - minJaccard) * (1.0 - minJaccard) * p.candVolume).toLong
    if (minJaccard >= 0.3 && prefVolume <= exactBudget) JaccardRoute.Prefix
    else if (p.candVolume <= exactBudget) JaccardRoute.Exact
    else if (minJaccard >= 0.65) JaccardRoute.Prefix
    else JaccardRoute.Lsh(64, lshBandsFor(minJaccard))
  }

  /** Fewest bands (of 64 hashes) whose S-curve midpoint (1/b)^(r⁻¹)
    * does not exceed θ — the most selective banding that still puts
    * the recall knee at or below the threshold (midpoints: b=8→0.77,
    * 16→0.50, 32→0.18, 64→0.016). */
  private[graft] def lshBandsFor(minJaccard: Double): Int =
    Seq(8, 16, 32).find(b =>
      math.pow(1.0 / b, b.toDouble / 64.0) <= minJaccard).getOrElse(64)

  /** Auto-routed Jaccard pairs: profile → route → dispatch, with the
    * decision logged loudly (a user of the three-engine family should
    * not need to know the regimes by heart — carryover VERDICT r7–r9).
    * Exact/prefix routes return the identical recall-1 result; the
    * LSH route is probabilistic and the log names its banding. */
  def jaccardPairsAuto(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = WordGrams(2), minJaccard: Double = 0.5,
      exactBudget: Long = 1000000000L)(
      implicit ctx: PipelineContext): DataFrame =
    jaccardPairsAutoRouted(df, idCol, textCol, shingle, minJaccard,
      exactBudget)._2

  /** [[jaccardPairsAuto]] returning the DECISION with the pairs — the
    * gate surface: a driver gate pins the route string against its
    * oracle, so a silent regime change (profile drift, a routing-rule
    * edit) flips the gate red instead of silently paying the wrong
    * engine. */
  def jaccardPairsAutoRouted(
      df: DataFrame, idCol: String, textCol: String,
      shingle: ShingleMode = WordGrams(2), minJaccard: Double = 0.5,
      exactBudget: Long = 1000000000L)(
      implicit ctx: PipelineContext): (String, DataFrame) = {
    val p = jaccardProfile(df, idCol, textCol, shingle)
    val route = jaccardRouteFor(p, minJaccard, exactBudget)
    println(s"JROUTE postings=${p.postings} distinct_grams=${p.nGrams} " +
      s"cand_volume=${p.candVolume} budget=$exactBudget " +
      s"theta=$minJaccard -> $route" + (route match {
        case JaccardRoute.Lsh(n, b) =>
          f" (PROBABILISTIC: S-curve midpoint ${math.pow(1.0 / b, b.toDouble / n)}%.3f)"
        case _ => " (recall 1)"
      }))
    val pairs = route match {
      case JaccardRoute.Exact =>
        jaccardPairsExact(df, idCol, textCol, shingle, minJaccard)
      case JaccardRoute.Prefix =>
        jaccardPairsPrefix(df, idCol, textCol, shingle, minJaccard)
      case JaccardRoute.Lsh(n, b) =>
        minhashPairs(df, idCol, textCol, shingle,
          numHashes = n, bands = b, minJaccard = Some(minJaccard))
    }
    (route.toString, pairs)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * restricted to BANDED sign-bit LSH buckets.
    *
    * A single table of 2^nPlanes buckets has FIXED key cardinality —
    * candidate volume O(n²/2^p) is quadratic at any real corpus size
    * (an LSH costume over an all-pairs join). Banding fixes both axes
    * of the trade: `bands` independent hyperplane tables of `nPlanes`
    * planes each (per-band seeds) give recall 1-(1-r^p)^b — r = 1-θ/π
    * per plane — so p can be raised (more, smaller buckets ⇒
    * sub-quadratic candidates) while b buys the recall back; exactly
    * minhash banding's geometry with hyperplane signs as the hash. At
    * defaults (b=4, p=8, cos ≥ 0.95 ⇒ r ≈ 0.90): recall ≈ 0.93 with
    * 4×256 buckets; for 100 TB raise p with n (p ≈ log2(n/target
    * bucket size)) and b to the recall budget.
    *
    * Degenerate buckets (many near-parallel vectors, or all-zero
    * embeddings) are capped via a NARROW (band,bucket) count — the
    * wide vector rows are never shuffled for sizing, only for the
    * candidate join itself — then dropped (log-and-drop, as
    * [[minhashPairs]]). The verify filter keeps precision at 1
    * regardless of banding. */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCosine: Double = 0.95, nPlanes: Int = 8, bands: Int = 4,
      maxBucket: Int = 2000)(
      implicit ctx: PipelineContext): DataFrame =
    embeddingCandidates(df, idCol, vecCol, dim, nPlanes, bands, maxBucket)
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
      .distinct()

  /** The candidate stage of [[embeddingPairs]] (pre-threshold, scored,
    * may contain per-band duplicates) — exposed inside graft for the
    * candidate-volume scale tests. */
  private[graft] def embeddingCandidates(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int, bands: Int, maxBucket: Int)(
      implicit ctx: PipelineContext): DataFrame = {
    import graft.functions.VectorFunctions
    // buckets AND norm computed once per vector (the staged frame holds
    // the b-bucket array, not b copies of the vector); the candidate
    // join then evaluates a single codegen'd dot per pair
    val withBucket = ctx.stage(df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bks", array((0 until bands).map(bd =>
        VectorFunctions.lshBucket(col("v"), dim, nPlanes, seed = 42L + bd)): _*))
      .withColumn("nrm", VectorFunctions.l2Norm(col("v"))))
    val exploded = withBucket
      .select(col("id"), col("v"), col("nrm"),
        posexplode(col("bks")).as(Seq("band", "bucket")))
    val okBuckets = exploded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket))
      .select(col("band"), col("bucket"))
    val capped = exploded.join(okBuckets, Seq("band", "bucket"), "left_semi")
    val a = capped.select(col("band"), col("bucket"), col("id").as("id1"),
      col("v").as("v1"), col("nrm").as("n1"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id2"),
      col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", VectorFunctions.cosinePre(
        VectorFunctions.dot(col("v1"), col("v2")), col("n1"), col("n2")))
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): partition the embedding space
    * into clusters, then mark a vector a DUPLICATE when some
    * smaller-id vector in the SAME cluster sits at cosine ≥
    * `minCosine` — the paper's "max similarity against the items
    * preceding it in the cluster ordering" rule with the id as the
    * deterministic ordering. Pairwise similarity is only ever computed
    * inside a cluster, never across the corpus: with k clusters the
    * pair volume is Σ|cluster|² ≈ n²/k, so at 100 TB k grows with n
    * (the paper uses k ∝ √n) and the per-cluster equi-join stays
    * bounded — the clustering IS the blocking structure, exactly the
    * role buckets play in [[embeddingPairs]] but with semantically
    * meaningful blocks. Degenerate clusters above `maxCluster` are
    * excluded from the pair stage (their members report not-dup) — the
    * same log-and-drop contract as the LSH bucket caps; sub-cluster
    * (re-run with finer centroids inside the whale) is the recall
    * path.
    *
    * Assignment is [[Similarity.assignToCentroids]] (broadcast
    * centroids, partial-agg argmax — engine-portable: rounded sim,
    * centroid-id tie-break), and the intra-cluster cosine is rounded
    * to 6 digits BEFORE the θ compare and the per-vector max, so a
    * relational engine replays the whole operator (gate t45). Returns
    * one row per input vector: (id, cluster, is_dup, max_prior_sim)
    * with max_prior_sim null for kept vectors — callers keep
    * `is_dup = 0` and get one representative (the min id) per
    * semantic-dup group transitively closed within the threshold
    * graph's id-order greedy cover. */
  def semanticDedup(
      vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      minCosine: Double, maxCluster: Int = 100000)(
      implicit ctx: PipelineContext): DataFrame = {
    import graft.functions.VectorFunctions
    // assignment feeds BOTH the pair join (twice, as each side) and
    // the final not-dup restore — stage it with the vector + norm so
    // the broadcast-argmax subtree runs once
    val member = ctx.stage(
      Similarity.assignToCentroids(vecs, idCol, vecCol, centroids, cidCol, cvecCol)
        .select(col("id"), col("cluster"))
        .join(vecs.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("v"))))
    // cap via a NARROW per-cluster count (ids only — vectors are not
    // shuffled for sizing), as the LSH bucket caps
    val okClusters = member.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn").between(2, maxCluster))
      .select(col("cluster"))
    val capped = member.join(okClusters, Seq("cluster"), "left_semi")
    val a = capped.select(col("cluster"), col("id").as("id1"),
      col("v").as("v1"), col("nrm").as("n1"))
    val b = capped.select(col("cluster"), col("id").as("id2"),
      col("v").as("v2"), col("nrm").as("n2"))
    val prior = a.join(b, Seq("cluster"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(VectorFunctions.cosinePre(
        VectorFunctions.dot(col("v1"), col("v2")), col("n1"), col("n2")), 6))
      .filter(col("cos") >= minCosine)
      .groupBy(col("id2").as("id"))
      .agg(max(col("cos")).as("max_prior_sim"))
    member.select(col("id"), col("cluster"))
      .join(prior, Seq("id"), "left")
      .withColumn("is_dup",
        when(col("max_prior_sim").isNotNull, lit(1L)).otherwise(lit(0L)))
      .select(col("id"), col("cluster"), col("is_dup"), col("max_prior_sim"))
  }

  /** Connected components over an undirected pair set — the step that
    * turns pairwise near-dup output ([[minhashPairs]] /
    * [[simhashPairs]] / [[embeddingPairs]]) into CLUSTERS so dedup can
    * keep one canonical doc per cluster (pairs alone under-delete:
    * A~B, B~C must drop two docs, not one per pair independently).
    * Returns (id, component) for every id appearing in a pair, with
    * component = the minimum reachable id (the standard keep-first
    * canonical rule). Ids in no pair are their own singleton clusters
    * and are not emitted.
    *
    * Min-label propagation with POINTER JUMPING: each round (a) pushes
    * labels across edges and keeps the per-node min, then (b) replaces
    * every label by its label's label (`comp := comp(comp)` — sound
    * because comp(x) ≤ x is invariant and every comp value is itself a
    * labeled node). The jump halves the remaining chain depth, so a
    * diameter-d cluster converges in O(log d) rounds instead of O(d) —
    * on a single box each round is a fixed number of job launches, and
    * on a cluster a fixed number of bounded shuffles (edge join,
    * groupBy id, label self-join), so log-rounds is the difference
    * between 6 rounds and 60 on chain-shaped near-dup families. The
    * same primitives extend to the alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC '14) if edge-set rewriting ever becomes
    * necessary. The loop fails loudly at maxIter rather than returning
    * a half-merged labeling; convergence is a LIMIT-1 existence probe
    * per round (the round's single materializing action — the
    * propagate/jump self-joins reuse the round's shuffle outputs).
    * Labels are narrow: two longs per CLUSTERED id only.
    *
    * SIZE-ADAPTIVE ROUTE (r18, the jaccardPairsAuto discipline): the
    * symmetric edge count is measured off the staged edge set (one
    * action the first round would have paid anyway); at or below
    * `spark.graft.components.maxDriverEdges` (default 200k ≈ 3 MB of
    * id pairs) the fixpoint runs as a DRIVER-side union-find over the
    * collected edges — identical labels (component = min reachable
    * id; the property spec pins both routes against each other), ~2
    * Spark actions instead of O(log d) rounds × (join + groupBy +
    * self-join) shuffles. Near-dup edge sets are a small fraction of
    * any real corpus, but they are NOT bounded — past the threshold
    * (or for id types with no natural ordering here) the distributed
    * pointer-jumping loop runs unchanged. */
  def componentsOf(
      pairs: DataFrame, aCol: String = "id1", bCol: String = "id2",
      maxIter: Int = 25)(
      implicit ctx: PipelineContext): DataFrame = {
    val spark = pairs.sparkSession
    val edges = ctx.stagePersist(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .distinct())
    val maxDriverEdges = spark.conf.get(
      "spark.graft.components.maxDriverEdges", "200000").toLong
    val idType = edges.schema("u").dataType
    val ord: Option[Ordering[Any]] = (idType match {
      case _: org.apache.spark.sql.types.LongType => Some(Ordering.Long)
      case _: org.apache.spark.sql.types.IntegerType => Some(Ordering.Int)
      case _: org.apache.spark.sql.types.ShortType => Some(Ordering.Short)
      case _: org.apache.spark.sql.types.StringType => Some(Ordering.String)
      case _ => None
    }).map(_.asInstanceOf[Ordering[Any]])
    // materializes the staged edge set either way — the distributed
    // loop's first convergence action previously paid this
    if (ord.isDefined && maxDriverEdges > 0L &&
        edges.count() <= maxDriverEdges) {
      implicit val o: Ordering[Any] = ord.get
      // union-find with path compression; the canonical label is the
      // set MINIMUM, applied in a second pass so union order is free
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      val es = edges.collect()
      es.foreach { row =>
        val (ru, rv) = (find(row.get(0)), find(row.get(1)))
        if (ru != rv) parent(rv) = ru
      }
      val nodes = (es.iterator.map(_.get(0)) ++ es.iterator.map(_.get(1)))
        .toArray.distinct
      val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
      nodes.foreach { v =>
        val r = find(v)
        minOf.get(r) match {
          case Some(m) if o.lteq(m, v) => ()
          case _ => minOf(r) = v
        }
      }
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(nodes.map(v =>
          org.apache.spark.sql.Row(v, minOf(find(v)))): _*)
      return spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType))))
    }
    // init folds the first propagation in: comp = min(id, neighbors)
    // straight off the edge groupBy — one fewer round
    var labels = ctx.stagePersist(
      edges.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("component"))
        .select(col("u").as("id"), col("component")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val pushed = edges.join(labels, edges("u") === labels("id"))
        .select(col("v").as("id"), col("component"))
      val propagated = labels.unionByName(pushed)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
      // comp(comp): inner join is total — every component value is an
      // id in `propagated` (labels keep every id; comp(x) starts at x)
      val jumped = ctx.stagePersist(propagated.as("l")
        .join(propagated.select(col("id").as("cid"), col("component").as("cc")),
          col("l.component") === col("cid"))
        .select(col("l.id").as("id"), col("cc").as("component")))
      converged = jumped
        .join(labels.withColumnRenamed("component", "prev"), Seq("id"))
        .filter(col("component") < col("prev"))
        .limit(1).isEmpty
      labels = jumped
      iter += 1
    }
    require(converged,
      s"componentsOf: no fixpoint after $maxIter rounds — cluster diameter " +
        "exceeds the propagation budget; raise maxIter")
    labels
  }

  /** Collapse near-dup clusters to one document each — the end product
    * of the dedup family: given the corpus and a pair set
    * ([[minhashPairs]] etc.), keep per connected component the row with
    * the highest `scoreCol` (ties to the smallest id — fully
    * deterministic), and pass every unclustered row through untouched.
    * The keep-best-quality rule is the standard web-corpus choice
    * (among near-identical pages keep the cleanest extraction), with
    * keep-first as the degenerate `scoreCol = idCol` case.
    *
    * Shape at 100 TB: clustered ids are a small fraction of any real
    * corpus, so the expensive paths stay proportional to the CLUSTERED
    * subset — the component labels (two longs per clustered id) join
    * against the corpus (AQE broadcasts them when they fit), the
    * rank-1 window shuffles only clustered rows partitioned by
    * component (cluster sizes are bucket-capped upstream, so no
    * whale partitions), and the unclustered complement is a plain
    * anti join that never touches a window. */
  def keepRepresentatives(
      docs: DataFrame, idCol: String, pairs: DataFrame, scoreCol: String,
      aCol: String = "id1", bCol: String = "id2")(
      implicit ctx: PipelineContext): DataFrame = {
    // rename the label frame's columns so a corpus whose id column is
    // literally "id" (or that carries a "component" column) can't
    // collide with them
    val comps = componentsOf(pairs, aCol, bCol)
      .select(col("id").as("__cid"), col("component").as("__comp"))
    val clustered = docs.join(comps, docs(idCol) === comps("__cid")).drop("__cid")
    val w = Window.partitionBy(col("__comp"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val reps = clustered
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__comp")
    docs.join(comps, docs(idCol) === comps("__cid"), "left_anti")
      .unionByName(reps)
  }
}
