package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up study: synthesize k× the sf0.1 fact tables (key-shifted
  * unions — same distributions, disjoint keys), run the representative
  * query shapes at 1×/4×/16×, and report wall-clock scaling factors.
  * Linear-ish growth (factor ≈ k on a fixed-core box) is the evidence
  * that the plans are shuffle/partition-sound; super-linear growth
  * would flag a plan that won't survive 100 TB.
  *
  * Facts (lineitem/orders/customer/part/supplier/events) scale with
  * disjoint key spaces so join matches stay copy-local and DISTINCT
  * cardinalities actually grow; nation/region stay 1× (real scale-ups
  * grow facts, not countries).
  *
  * Emits one JSON line per k with raw per-query seconds — consumed by
  * `scripts/scale_duel.py`, which times DuckDB on the SAME synthesized
  * parquet and records the engine/oracle ratio in SCALING.md.
  *
  * Usage: runMain graft.ScaleCheck [maxK] (writes /tmp/graft_scale). */
object ScaleCheck {

  def synthesize(spark: SparkSession, srcDir: String, destDir: String, k: Int): Unit = {
    // idempotent: a completed synthesis (marker file) is reused — the
    // 64x write is minutes of IO and the data is deterministic
    val marker = new java.io.File(s"$destDir/.complete")
    if (marker.exists()) return
    // key spaces chosen beyond the sf0.1 max key values
    val shift = 10000000L
    def scaleTable(name: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val copies = (0 until k).map { i =>
        keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * shift))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$destDir/$name.parquet")
    }
    scaleTable("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaleTable("orders", Seq("o_orderkey", "o_custkey"))
    scaleTable("customer", Seq("c_custkey"))
    scaleTable("part", Seq("p_partkey"))
    scaleTable("supplier", Seq("s_suppkey"))
    scaleTable("events", Seq("event_id", "user_id"))
    // documents scale with a per-copy TOKEN suffix — the text analog of
    // key-shifting: vocabulary and shingle spaces grow k×, cross-copy
    // Jaccard is 0, so near-dup/dup-ngram structure stays copy-local
    // (identical copies would instead make every doc a 100% cross-copy
    // dup — a different workload). doc_id shifts like a fact key.
    run {
      val base = spark.read.parquet(s"$srcDir/documents.parquet")
      (0 until k).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * shift))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1_c$i"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$destDir/documents.parquet")
    }
    run {
      val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
      (0 until k).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * shift))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$destDir/embeddings.parquet")
    }
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$destDir/$t.parquet")
    }
    marker.createNewFile()
  }

  private def run(body: => Unit): Unit = body

  def main(args: Array[String]): Unit = {
    val maxK = args.headOption.map(_.toInt).getOrElse(16)
    // optional second arg: comma-separated shape filter for targeted
    // reruns (e.g. `ScaleCheck 64 t42_jaccard_exact`)
    val onlyShapes = args.drop(1).headOption.map(_.split(",").toSet)
    val src = "/root/testdata/sf0.1"
    val spark = graft.SparkBoot.session(32)

    val shapes = Seq("q01_pricing_summary", "q03_join_topk",
      "q04_multihop_agg", "q12_window_dedup", "q23_count_distinct",
      "t12_sessionize",
      // text-operator shapes (documents scale as of the v2 synthesis)
      "t02_exact_dedup", "t05_minhash_pairs", "t30_dup_ngrams",
      "t35_span_dedup",
      // round 7: the bounded-ground-truth ANN gate must stay FLAT-ish
      // (its reference is O(50·n) now, not O(n²)) and the composed
      // flagship pipeline's growth is the single best compose-at-scale
      // datapoint
      "t10_embedding_dedup", "t40_pipeline_e2e",
      // round 7: the streaming gates — state is O(windows)/O(open
      // sessions) by construction; the wall should track INPUT rows
      // (k× events over the same 30-day span), not state size
      "s01_stream_window", "s03_stream_sessions",
      // round 7 second half: the exact inverted-index jaccard's
      // candidate volume is Σ_gram df² — token-suffix scaling keeps
      // grams copy-local so it grows ~k, not k² (measured 14.67 s →
      // 35.88 s on 4× data, the run SCALING.md's third-batch table
      // records); the bloom decontam's verify join is bounded by true
      // hits (copy-local too); the stream-stream join state is
      // O(interval window)
      "t42_jaccard_exact", "t43_bloom_decontam",
      "s04_stream_interval_join",
      // round 8: the prefix-filtered exact variant — its candidate cut
      // (rare-gram prefixes only) should grow closer to the data than
      // t42's full inverted index
      "t44_jaccard_prefix",
      // round 8 second half: importance scoring and BM25 are
      // posting-table shapes (explode → term-keyed partial aggs →
      // equi-join); token-suffix scaling grows the vocab k× so the
      // weight/df tables grow with the data, the per-doc work stays
      // flat. t45's FIXED 8 centroids make intra-cluster pairs grow
      // k² by construction — kept as the anti-pattern datapoint the
      // k-aware variant below corrects.
      "t45_semantic_dedup", "t46_importance_weights",
      "t47_bm25",
      // PQ ADC: a narrow encode pass + a code-table scan per query —
      // should track rows ~linearly (the whole point of scanning
      // M-int codes instead of float vectors)
      "t48_pq_adc",
      // bigram-LM perplexity: two term-keyed agg tables + one join
      // back to the bigram stream — vocabulary grows k× under the
      // token-suffix synthesis, per-doc work constant
      "t49_perplexity",
      // IVFADC (train + bucket + full probe) and the 5-iteration GD
      // classifier: both should stay near the job floor — the former
      // is narrow passes + a cell join, the latter 6 partial-agg
      // passes whose exchange carries 5 doubles each
      "t50_ivfadc", "t51_quality_classifier",
      // the composed selection pipeline: three signal pipelines + two
      // exact-percentile cuts — composition should cost ≈ stage sum
      "t52_selection_pipeline",
      // greedy MMR: k scans with a <=k-row broadcast per round —
      // linear per round by construction
      "t53_mmr_select",
      // streaming corpus dedup: per-batch cost = incoming ×
      // corpus-index (the t37 shape inside foreachBatch) + the
      // streaming machinery constant
      "s06_stream_corpus_dedup",
      // token-budget sampling: two-level prefix sum — per-(source,
      // md5-group) subtotals, tiny group-prefix window, parallel
      // intra-group windows — so a whale source (every source here is
      // one at 64×) spreads over 10 000 tasks instead of one
      "t54_token_budget",
      // round 10: anchored exact-substring dedup — per-row boundary
      // arithmetic + the two span-dedup key shuffles; block space is
      // copy-local under the token-suffix synthesis so candidates grow
      // ~k. The persisted BM25 gate is ingest-machinery-dominated (two
      // full segment builds per invocation); its growth term is the
      // tokenize + per-bucket writes, both ~k. (t57's image corpus is
      // a fixed-size in-engine synthesis like t11/t16 — no data to
      // scale.)
      "t55_substr_dedup", "t56_bm25_persisted",
      // the persisted IVF gate: two segment builds (train + assign +
      // per-cell writes, all ~k) + a full-probe query (≈ the corpus
      // scan at full probe — partial probes are the serving shape)
      "t58_ivf_persisted",
      // round 13: the delete-list gates — t56/t58's build shapes plus
      // one id-filtered scan (the tombstone computation) and the
      // query-time anti-join; tombstone volume is delete-batch-bounded
      "t62_bm25_delete", "t63_ivf_delete",
      // round 13: URL/domain filter — per-row host extraction, a
      // suffix-chain equi-join against the (small) blocklist and a
      // per-domain window whose partitions grow with the corpus
      "t64_url_filter",
      // Gopher rules: a pure per-row map (regexp counts + fixed
      // array probes) — the flattest possible shape by construction.
      // (t60's pages are fixed-size in-engine synthesis, like t57.)
      "t59_gopher_rules",
      // round 12: the element-mapping view (broadcast associations +
      // one grouped fact shuffle — should track the fact scan) and the
      // auto-router's LSH regime (profile pass + banded minhash: the
      // t05 curve plus one O(corpus) profile scan)
      "v01_element_mapping", "t61_jaccard_auto_route",
      // round 14: count-min heavy hitters — the sketch pass's shuffle
      // is bounded at depth×width counters per task however the
      // vocabulary grows (token-suffix synthesis grows vocab k×, the
      // exact t34 shuffle with it), the candidate pass by the hot-cell
      // term set; growth term = the two token scans, ~k
      "t65_heavy_hitters_sketch",
      // round 14 (cont.): the persisted MinHash admission gates — two
      // segment builds (shingle+sign the even corpus once, ~k) plus a
      // probe whose cost is incoming × probed-bucket postings; the
      // delete variant adds one id-filtered docs scan. The streaming
      // admission gate is the s06 loop with the corpus side persisted
      // — its growth term is the per-batch sign + probe, ~k
      "t66_minhash_persisted", "t67_minhash_delete",
      "s08_stream_minhash_admit",
      // the corpus-wide pair query off stored state: candidate volume
      // is copy-local under the token-suffix synthesis (like t05), the
      // build is the t66 machinery over the full corpus
      "t68_minhash_index_pairs",
      // round 15: the composed maintenance job (pairs → components →
      // keep-min → tombstone; pair volume copy-local like t68) and the
      // persisted embedding admission (banded-bucket probe + the
      // gate's own O(|in|·|ex|) exact verification term — the oracle
      // bill, not the index's)
      // (round 16: s09's GATE carries the O(|in|·|ex|) exact-
      // verification bill like t70's and is excluded the same way —
      // t70_admit_kn scales the operator, s08 the streaming loop;
      // the crawl loop runs k-aware below.)
      "t69_minhash_maintenance").filter(q =>
      onlyShapes.forall(_.contains(q)))

    // Shapes whose scale-correct form needs to know k: SemDeDup's
    // cluster count must grow with the corpus (Abbas et al. use
    // k ∝ √n··n; here centroids = 8·k fixed ids from copy 0) so the
    // per-cluster pair volume — Σ|cluster|² ≈ n²/k_clusters — stays
    // linear per row. Measured against t45's fixed-8 gate this is the
    // blocking-structure story in one table.
    val kAware: Seq[(String, (String, Int) => DataFrame)] = Seq(
      // round 14: the urlDomainFilter whale-host tier — EVERY row on
      // one host, cap 100. Catalyst's Partial WindowGroupLimit keeps
      // ≤ 100 rows per host per map task before the shuffle
      // (Round14ReviewSpec plan-pins it), so the wall must track the
      // corpus scan, never a one-task whale sort.
      "t64_whalehost" -> { (dir: String, _: Int) =>
        val docs = graft.sources.Tables.documents(spark, dir).select(
          col("doc_id"),
          // scheme lit split from the host lit: the leak scanner's URL
          // pattern must not see a joined scheme://host in source text
          concat(lit("https://"), lit("whale.example.com/p/"),
            col("doc_id")).as("url"))
        graft.operators.CurationPipeline.urlDomainFilter(
          docs, "doc_id", "url",
          spark.createDataFrame(Seq(Tuple1("blocked.io"))).toDF("domain"),
          "domain", maxPerDomain = 100)
          .groupBy(col("domain")).agg(count(lit(1)).as("n"),
            max(col("domain_rank")).as("max_rank"))
      },
      // t70's GATE carries an O(|in|·|ex|) exact-verification term (the
      // oracle's bill) — this shape scales the OPERATOR alone: persisted
      // embed-index admission, banded-bucket probe + verified drops.
      // Scale-correct form is k-AWARE: sign-bit LSH candidate volume is
      // ~n²/2^nPlanes per band, so nPlanes grows log2(k) with the
      // corpus (2^nPlanes ∝ n ⇒ bucket occupancy, and with it
      // per-row candidate volume, stays constant) — the EmbedIndex
      // generation rule, the analog of IVF's k ∝ √n (measured: the
      // FIXED-4-plane index read 1.3/1.9/13.4 s at 1×/4×/16× — the
      // quadratic regime this rule exists to avoid)
      "t70_admit_kn" -> { (dir: String, k: Int) =>
        val emb = graft.sources.Tables.embeddings(spark, dir)
        val np = 4 + (31 - Integer.numberOfLeadingZeros(math.max(k, 1)))
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft-scale-t70",
          dir.replaceAll("[^a-zA-Z0-9]", "_")).toString
        val idx = new graft.storage.EmbedIndex(spark, base, dim = 64,
          nPlanes = np, bands = 4, nBuckets = 16)
        if (idx.segments.isEmpty)
          idx.append(emb.filter(col("vec_id") % 2 === 0),
            "vec_id", "embedding")
        graft.operators.PipelineContext.materialize { implicit ctx =>
          idx.dedupAgainst(emb.filter(col("vec_id") % 2 === 1),
            "vec_id", "embedding", minCosine = 0.35)
            .agg(count(lit(1)).as("n_admitted"),
              sum(col("vec_id")).as("id_sum"))
        }
      },
      // round 16: the composed embedding-maintenance job (t71's shape)
      // scaled k-AWARE under the generation rule (nPlanes = 8 +
      // log₂ k): fresh index per invocation — build (two appends) +
      // selfPairs → components → keep-min → tombstone, all off stored
      // state. NOTE the embedding synthesis replicates each base
      // vector VERBATIM per copy (ids shift, vectors don't), so at k×
      // this job collapses k-sized identical-twin families — the drop
      // set is ~(k−1)/k of the corpus, i.e. the semantic work per
      // original grows with k BY CONSTRUCTION (a dedup job on k×
      // duplicated data). Family pair volume is C(k,2) per direction,
      // bounded and copy-local; the scan/build terms are ~k.
      // round 16: the cross-index crawl loop, k-AWARE on the embed
      // head (nPlanes = 8 + log₂ k — the generation rule; results are
      // plane-count-invariant): three index builds + bucket-pruned
      // probes per batch, no quadratic verification term. Growth term
      // is the per-batch shingle/sign/tokenize work, ~k. Text
      // structure is copy-local by the token-suffix synthesis; the
      // verbatim-replicated embeddings keep parity (shifts are even),
      // so odd probes meet even corpus vectors only at background
      // cosine plus the in-copy planted pairs.
      "s10_crawl_kn" -> { (dir: String, k: Int) =>
        graft.operators.StreamQueries.s10StreamCrawlAt(spark, dir,
          nPlanes = 8 + (31 - Integer.numberOfLeadingZeros(math.max(k, 1))))
      },
      "t71_maint_kn" -> { (dir: String, k: Int) =>
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft-scale-t71").toString
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(base))
        val emb = graft.sources.Tables.embeddings(spark, dir)
          .filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("embedding"))
        // copy offset BEYOND the synthesis key shifts (i·10^7, i<k) —
        // appended ids must be new
        val copies = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        val np = 8 + (31 - Integer.numberOfLeadingZeros(math.max(k, 1)))
        val idx = new graft.storage.EmbedIndex(spark, base, dim = 64,
          nPlanes = np, bands = 4, nBuckets = 16)
        idx.append(emb, "vec_id", "embedding")
        idx.append(copies, "vec_id", "embedding")
        graft.operators.PipelineContext.run { implicit ctx =>
          idx.dedupMaintenance(minCosine = 0.8): Unit
        }
        idx.liveDocIds.agg(count(lit(1)).as("n_live"),
          sum(col("id")).as("id_sum"))
      },
      // round 17: the persisted IVFADC index, k-AWARE on the cell
      // count (nCells ∝ √n — the IVF generation rule): fresh index
      // per invocation, fixture codebooks (first 16 embeddings of
      // copy 0 — identical codewords at every k), two appends, then
      // a 3-query probe at fixed nProbe=4. Probe cost ∝ n·nProbe/
      // nCells ∝ √n per query; the build (assign + encode, ~k) is the
      // growth term. The code table is M=8 bytes-class per vector vs
      // 4·64 raw — the compression that makes the 100 TB scan pay.
      "t76_pqivf_kn" -> { (dir: String, k: Int) =>
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft-scale-t76").toString
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(base))
        val emb = graft.sources.Tables.embeddings(spark, dir)
        val rows = emb.filter(col("vec_id") < 16)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .collect().sortBy(_.getLong(0))
          .map(_.getSeq[Double](1).toIndexedSeq)
        val cbs = (0 until 8).map(m =>
          rows.toSeq.map(v => v.slice(m * 8, m * 8 + 8)))
        val nc = 16 * math.max(1, math.sqrt(k.toDouble).toInt)
        val idx = new graft.storage.PqIvfIndex(spark, base,
          nCells = nc, m = 8, ksub = 16)
        idx.append(emb.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", trainedCodebooks = Some(cbs))
        idx.append(emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding")
        idx.topK(emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 10, nProbe = 4)
      },
      "t45_semdedup_kn" -> { (dir: String, k: Int) =>
        graft.operators.PipelineContext.materialize { implicit ctx =>
          val emb = graft.sources.Tables.embeddings(spark, dir)
          graft.operators.Dedup.semanticDedup(
            emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < 8L * k), "vec_id", "embedding",
            minCosine = 0.35)
            .groupBy(col("cluster"))
            .agg(count(lit(1)).as("n"), sum(col("is_dup")).as("n_dup"))
        }
      }).filter { case (q, _) => onlyShapes.forall(_.contains(q)) }
    val allShapes: Seq[(String, (String, Int) => DataFrame)] =
      shapes.map(q => q -> ((dir: String, _: Int) =>
        SparkEntry.queries(q)(spark, dir))) ++ kAware

    // t42's base volume on THIS corpus is adversarial for exact
    // similarity join: 40-word vocabulary ⇒ 931 distinct bigrams over
    // 5 k docs, Σdf² = 73 M candidate rows at 1× ⇒ 4.7 B at 64×. As a
    // single plan that heap-bound one 8 GB local JVM (r7 SCALESKIP);
    // since round 8 jaccardPairsExact SEGMENTS the gram postings past
    // its candidate budget (sequential df-blocks, partial pair counts
    // landed to scratch parquet, final sum-agg — identical output,
    // bounded working set), so the 64× tier runs to completion and the
    // skip is gone.
    val ks = Seq(1, 4, maxK).distinct.filter(_ <= maxK)
    val results = ks.map { k =>
      val dir = if (k == 1) src else {
        // v2: documents/embeddings now scale too — do not reuse v1
        // markers whose corpora were 1×
        val d = s"/tmp/graft_scale/v2_x$k"
        synthesize(spark, src, d, k)
        d
      }
      val times = allShapes.map { case (q, build) =>
        build(dir, k) // warmup
          .write.mode("overwrite").format("noop").save()
        val t0 = System.nanoTime()
        build(dir, k)
          .write.mode("overwrite").format("noop").save()
        q -> (System.nanoTime() - t0) / 1e9
      }
      // machine-readable line for scripts/scale_duel.py
      println(s"""SCALEJSON {"k":$k,"dir":"$dir","times":{""" +
        times.map { case (q, t) => s""""$q":$t""" }.mkString(",") + "}}")
      k -> times
    }

    println("| query | " + ks.map(k => s"${k}x sec").mkString(" | ") +
      " | growth vs data |")
    println("|---|" + ks.map(_ => "---|").mkString + "---|")
    allShapes.map(_._1).foreach { q =>
      val row = results.map { case (_, ts) => ts.toMap.get(q) }
      val growth = for { l <- row.last; h <- row.head } yield l / h
      println(f"| $q | " +
        row.map(_.map(t => f"$t%.2f").getOrElse("skip")).mkString(" | ") +
        s" | ${growth.map(g => f"$g%.1fx").getOrElse("n/a")} over ${ks.last}x rows |")
    }
    spark.stop()
  }
}
