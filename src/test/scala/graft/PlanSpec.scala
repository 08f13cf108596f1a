package graft

import graft.operators.RelationalQueries
import graft.query.cypher.CypherCompiler
import graft.sources.TpchGraph

/** Physical-plan assertions — the properties that decide whether these
  * plans survive a 100 TB scale-up. A correctness-green query with the
  * wrong plan (filters not pushed, dim tables shuffled, full sorts for
  * top-k) fails here. */
class PlanSpec extends SparkTestBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02: all three filters reach the parquet scan as PushedFilters") {
    val plan = planOf(RelationalQueries.q02FilterAgg(spark, sfDir))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"))
    assert(plan.contains("LessThan(l_quantity,24.0)"))
  }

  test("q02: scan reads only the needed columns (pruning)") {
    val plan = planOf(RelationalQueries.q02FilterAgg(spark, sfDir))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(!readSchema.contains("l_returnflag"), s"unpruned scan: $readSchema")
  }

  test("q04: dimension joins broadcast; no shuffle of nation/region") {
    val plan = planOf(RelationalQueries.q04MultiHopAgg(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q09 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(RelationalQueries.q09TopK(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q01 aggregation is partial (map-side combine) before the shuffle") {
    val plan = planOf(RelationalQueries.q01PricingSummary(spark, sfDir))
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"no partial aggregation in:\n$plan")
  }

  test("whole-stage codegen covers the q01 hot path") {
    val df = RelationalQueries.q01PricingSummary(spark, sfDir)
    df.collect() // AQE finalizes stages on execution
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen stages in the final plan
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("*("), s"no codegen stages in:\n$plan")
  }

  test("cypher-compiled pattern query keeps filter pushdown through the joins") {
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      """MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         WHERE c.mktsegment = 'BUILDING'
         RETURN c.identifier AS id, count(o) AS n""")
    val plan = planOf(df)
    // the mktsegment predicate must reach the customer parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]"),
      s"filter not pushed:\n$plan")
  }

  test("label-less MATCH (n) count scans only the pk column per node table") {
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      "MATCH (n) RETURN label(n) AS lbl, count(n) AS cnt")
    val plan = planOf(df)
    // 5 node tables → 5 scans, each pruned to its single key column
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { rs =>
      assert(rs.count(_ == ',') == 0, s"unpruned any-node scan: $rs")
    }
    assert(!plan.contains("c_mktsegment") && !plan.contains("o_totalprice"),
      "any-node union must not read property columns")
  }

  test("untyped-rel hop stays a union of typed equi-joins (no cartesian)") {
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      "MATCH (c:Customer)-[r]->(n) RETURN type(r) AS t, count(*) AS cnt")
    val plan = planOf(df)
    assert(plan.contains("Union"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"union hop degenerated to a cross product:\n$plan")
  }

  test("anonymous rel scan ()-[r]->() plans as a join-free rel-table union") {
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      "MATCH ()-[r]->() RETURN label(r) AS t, count(*) AS n")
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"metrics rel scan should not join:\n$plan")
    assert(plan.contains("Union"))
  }

  test("semi/anti joins plan as joins, not subquery re-scans") {
    val semi = planOf(RelationalQueries.q07SemiJoin(spark, sfDir))
    assert(semi.contains("LeftSemi"))
    val anti = planOf(RelationalQueries.q06AntiJoin(spark, sfDir))
    assert(anti.contains("LeftAnti"))
  }

  test("fused rel scan: (c)-[:PLACED]->(o) reads the orders parquet ONCE") {
    // CUSTOMER_PLACED_ORDER derives from the same rows as the Order
    // node; without the fused frame the plan scans orders twice and
    // joins them back together on their own unique key
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      """MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN c.mktsegment AS seg, round(sum(o.totalprice), 2) AS spend
         ORDER BY seg""")
    val plan = planOf(df)
    val ordersScans = plan.linesIterator.count(l =>
      l.contains("Location:") && l.contains("orders"))
    assert(ordersScans === 1, s"expected 1 orders scan, got $ordersScans:\n$plan")
  }

  test("FK join elision: key-only far node joins disappear from the plan") {
    // c02 shape: count(o) touches only o's key, so the Order node join
    // is elided entirely — ONE join (customer x rel), two scans total
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      """MATCH (c:Customer)
         OPTIONAL MATCH (c)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN c.identifier AS identifier, count(o) AS order_cnt
         ORDER BY identifier""")
    val plan = planOf(df)
    val scans = plan.linesIterator.count(_.contains("Location:"))
    assert(scans === 2, s"expected 2 scans (customer + orders rel), got $scans:\n$plan")
    // pass-through node in a chain: Nation scanned only for its rel
    // table (derived from customer/nation), never as a node join
    val chain = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      """MATCH (c:Customer)-[:CUSTOMER_IN_NATION]->(n:Nation)
               -[:NATION_IN_REGION]->(r:Region)
         RETURN r.name AS region, count(c) AS customers
         ORDER BY region""")
    val chainPlan = planOf(chain)
    // customer (anchor) + customer-rel + nation-rel + region = 4 scans;
    // an un-elided Nation node join would make it 5
    val chainScans = chainPlan.linesIterator.count(_.contains("Location:"))
    assert(chainScans <= 4, s"Nation node join not elided ($chainScans scans):\n$chainPlan")
  }

  test("any-rel hop with unused far node plans zero node-table scans beyond the anchor") {
    val df = new CypherCompiler(new TpchGraph(spark, sfDir)).run(
      """MATCH (c:Customer)-[r]->(n)
         RETURN type(r) AS rel_type, count(*) AS cnt
         ORDER BY rel_type""")
    val plan = planOf(df)
    // branches: CUSTOMER_IN_NATION (customer parquet) + PLACED_ORDER
    // (orders parquet) + the customer anchor = 3 scans; far-node joins
    // (nation, orders-as-node) would add two more
    val scans = plan.linesIterator.count(_.contains("Location:"))
    assert(scans <= 3, s"far node joins not elided ($scans scans):\n$plan")
  }

  test("EXISTS predicates plan semi/anti joins over key-only rel scans (c13)") {
    val plan = planOf(graft.operators.CypherQueries.c13Exists(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    // the rel-table side of each EXISTS reads ONLY the join key
    val orderScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("o_custkey")).toSeq
    assert(orderScans.nonEmpty)
    assert(orderScans.forall(l => !l.contains("o_totalprice") && !l.contains("o_orderkey")),
      s"EXISTS rel scan reads more than the key:\n${orderScans.mkString("\n")}")
  }

  test("hashSplit is a single pruned scan - no join, no pre-agg shuffle (t20)") {
    val plan = planOf(graft.operators.PipelineQueries.t20HashSplit(spark, sfDir))
    assert(!plan.contains("Join"), s"split must be narrow:\n$plan")
    // each physical scan appears once in the tree and once as a
    // "(n) Scan parquet" detail header — count the detail headers
    val scans = plan.linesIterator.count(_.matches("""^\(\d+\) Scan parquet\s*"""))
    assert(scans === 1, s"expected one documents scan, got $scans")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"unpruned scan: $readSchema")
  }

  test("packSequences shuffles once on the group key, not globally (t21)") {
    val plan = planOf(graft.operators.PipelineQueries.t21Packing(spark, sfDir))
    // window partitioning by group: hashpartitioning on the md5 bucket,
    // never a SinglePartition global sort
    assert(!plan.contains("SinglePartition"), s"global window in:\n$plan")
    assert(plan.contains("Window"), s"no window in:\n$plan")
  }

  test("decontaminate joins on the gram key - no cartesian, no global shuffle (t24 shape)") {
    // pin the OPERATOR, not the gate: the gate wraps in materialize()
    // whose collected local relation would make any plan assert vacuous
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val plan = planOf(graft.operators.CurationPipeline.decontaminate(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", n = 3))
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"nested-loop join in:\n$plan")
      assert(!plan.contains("SinglePartition"), s"global shuffle in:\n$plan")
      ()
    }
  }

  test("dupNgramStats joins on the gram key - no cartesian, no global shuffle (t30 shape)") {
    graft.operators.PipelineContext.run { implicit ctx =>
      val plan = planOf(graft.operators.CurationPipeline.dupNgramStats(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text", n = 2))
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"nested-loop join in:\n$plan")
      assert(!plan.contains("SinglePartition"), s"global shuffle in:\n$plan")
      assert(!plan.contains("Window"), s"window in:\n$plan")
      ()
    }
  }

  test("assignToCentroids argmax is a partial aggregate, never a window (t31 shape)") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val plan = planOf(graft.operators.Similarity.assignToCentroids(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 8), "vec_id", "embedding"))
    // the centroid side must arrive broadcast (k rows against the
    // corpus), and per-vector selection must partial-aggregate — a
    // rank window would shuffle every (vector, centroid) row
    assert(plan.contains("BroadcastExchange"), s"centroids not broadcast in:\n$plan")
    assert(!plan.contains("Window"), s"window argmax in:\n$plan")
    assert(plan.contains("partial_min"), s"no partial argmax in:\n$plan")
  }

  test("curriculumBuckets assigns by broadcast cutpoints - no corpus sort, no window (t33 shape)") {
    val plan = planOf(graft.operators.CurationPipeline.curriculumBuckets(
      graft.sources.Tables.documents(spark, sfDir), "n_chars", nBuckets = 10))
    // the ntile() formulation this replaces would show Window +
    // SinglePartition sort over the whole corpus
    assert(!plan.contains("Window"), s"window ntile in:\n$plan")
    assert(!plan.linesIterator.exists(_.matches("""^\(\d+\) Sort\s*""")),
      s"corpus sort in:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"cutpoints not broadcast in:\n$plan")
  }

  test("heavyHitters is partial-agg count + top-k, never a global sort (t34 shape)") {
    val plan = planOf(graft.operators.CurationPipeline.heavyHitters(
      graft.sources.Tables.documents(spark, sfDir), "text", k = 50))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side combine in:\n$plan")
  }

  test("dedupSpans reassembles per doc - no window, no cartesian (t35 shape)") {
    graft.operators.PipelineContext.run { implicit ctx =>
      val plan = planOf(graft.operators.CurationPipeline.dedupSpans(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        blockTokens = 8))
      assert(!plan.contains("Window"), s"window in:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("SinglePartition"), s"global shuffle in:\n$plan")
      ()
    }
  }

  test("samplePerStratum selects via a bounded partial aggregate, never a window (t27 shape)") {
    import org.apache.spark.sql.functions.col
    val plan = planOf(graft.operators.CurationPipeline.samplePerStratum(
      graft.sources.Tables.events(spark, sfDir), "event_id", "event_type", 100))
    // the whole point: no rank window (a whale stratum would serialize
    // onto one task) — selection is collect_top_k with a map-side
    // partial pass, so each partition ships at most k rows per stratum
    assert(!plan.contains("Window"), s"window-rank selection in:\n$plan")
    assert(plan.contains("collect_top_k"), s"no bounded top-k aggregate in:\n$plan")
    assert(plan.linesIterator.count(_.matches("""^\(\d+\) ObjectHashAggregate\s*""")) >= 2,
      s"missing partial/final aggregate pair in:\n$plan")
  }

  test("q23 distinct is two-level: map-side dedup before each exchange") {
    val plan = planOf(RelationalQueries.q23CountDistinct(spark, sfDir))
    // Both distinct branches must plan a PARTIAL HashAggregate keyed on
    // the distinct tuple BELOW the exchange — the shuffle then carries
    // per-partition-distinct rows only. With that in place the exchange
    // is minimal for EXACT distinct: its row count is the data's
    // distinct cardinality (measured dup factor at sf0.1 is 1.005 — the
    // shuffle rows ARE the answer's keys, and that exchange is the
    // scale-out mechanism, not overhead).
    val keyedPartials = plan.linesIterator.sliding(4).count { w =>
      w.exists(_.matches("""^\(\d+\) HashAggregate\s*""")) &&
        w.exists(l => l.startsWith("Keys") &&
          (l.contains("l_orderkey") || l.contains("ps#")))
    }
    assert(plan.contains("partial_count"), s"no partial aggregates in:\n$plan")
    assert(keyedPartials >= 2,
      s"expected key-grouped aggregates on both distinct branches in:\n$plan")
    // and the tiny 3-row side joins broadcast — never a shuffled join
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("jaccardPairsExact is an inverted-index equi-join - no cartesian (t42 shape)") {
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      val plan = planOf(graft.operators.Dedup.jaccardPairsExact(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        shingle = graft.operators.Dedup.WordGrams(2), minJaccard = 0.4))
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"nested-loop join in:\n$plan")
      assert(!plan.contains("SinglePartition"), s"global shuffle in:\n$plan")
      ()
    }
  }

  test("decontaminateBloom probes the bloom BEFORE the verify join (t43 shape)") {
    import org.apache.spark.sql.functions.{col, explode, lit, xxhash64}
    graft.operators.PipelineContext.run { implicit ctx =>
      val docs = graft.sources.Tables.documents(spark, sfDir)
      // full operator: join-safe end to end (the probe stage itself is
      // checkpoint-staged — it feeds two consumers — so its internals
      // are invisible downstream and pinned separately below)
      val full = planOf(graft.operators.CurationPipeline.decontaminateBloom(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", n = 3))
      assert(!full.contains("CartesianProduct"), s"cartesian in:\n$full")
      assert(!full.contains("BroadcastNestedLoop"), s"nested-loop join in:\n$full")
      // the probe stage's own shape: a codegen'd scalar filter over the
      // gram stream with NO join below it — the (1-fpp) volume cut
      // happens before anything shuffles on the gram key
      val grams = docs.select(col("doc_id").as("id"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("g"))
      val bloomBytes = grams
        .agg(graft.functions.SketchFunctions.bloomAgg(
          xxhash64(col("g")), 1024L, 10240L))
        .head().getAs[Array[Byte]](0)
      val probe = planOf(grams.filter(graft.functions.SketchFunctions.mightContain(
        lit(bloomBytes), xxhash64(col("g")))))
      assert(probe.contains("might_contain"), s"no bloom probe in:\n$probe")
      assert(!probe.contains("Join"), s"join below the probe in:\n$probe")
      // formatted mode marks codegen'd operators with "[codegen id :"
      assert(probe.contains("Filter [codegen id"), s"probe not codegen'd:\n$probe")
      ()
    }
  }

  test("semanticDedup pairs come from a cluster-keyed equi-join, never a cartesian (t45 shape)") {
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
      val plan = planOf(graft.operators.Dedup.semanticDedup(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", minCosine = 0.35))
      // the only nested-loop allowed is the broadcast-centroid cross
      // join inside assignToCentroids (k rows); the PAIR stage must be
      // a hash/merge equi-join on the cluster key
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      val bnl = plan.linesIterator.count(_.contains("BroadcastNestedLoop"))
      assert(bnl <= 1, s"$bnl nested-loop joins (only the centroid broadcast is allowed):\n$plan")
      ()
    }
  }

  test("bm25 broadcasts query terms against the posting table (t47 shape)") {
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      import spark.implicits._
      val q = Seq((1L, "dup join")).toDF("qid", "qtext")
      val plan = planOf(graft.operators.CurationPipeline.bm25TopDocs(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        q, "qid", "qtext", k = 5))
      assert(plan.contains("BroadcastHashJoin"), s"query side not broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      ()
    }
  }

  test("PQ ADC evaluates inside whole-stage codegen over the code scan (t48 shape)") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val rows = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toIndexedSeq)
    val books = (0 until 8).map(m => rows.toSeq.map(v => v.slice(m * 8, m * 8 + 8)))
    val df = graft.operators.Similarity.pqTopK(
      graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", books),
      "id", "codes",
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", books, k = 5)
    df.collect() // AQE finalizes stages
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("pq_adc"), s"no ADC expression in:\n$plan")
    // pq_adc appears inside a codegen stage (a `*(n)`-starred subtree),
    // not behind an interpreted fallback projection
    val starred = plan.linesIterator.filter(_.contains("pq_adc")).toSeq
    assert(starred.exists(_.contains("*(")), s"ADC outside codegen:\n${starred.mkString("\n")}")
  }

  test("classifier gradient passes are partial aggregates (t51 shape)") {
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      // the returned frame is the final loss aggregate over the staged
      // feature table — same shape as each gradient pass
      val plan = planOf(graft.operators.CurationPipeline.trainQualityClassifier(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        label = col("lang") === "en", iters = 1))
      assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
      assert(!plan.contains("Join"), s"join in a pure aggregate pass:\n$plan")
      ()
    }
  }

  test("gopherRules and c4Clean are shuffle-free pure maps (t59/t60 shape)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val gopher = planOf(graft.operators.CurationPipeline.gopherRules(
      docs, "doc_id", "text"))
    assert(!gopher.contains("Exchange"), s"shuffle in a pure map:\n$gopher")
    assert(!gopher.contains("Join"), s"join in a pure map:\n$gopher")
    val c4 = planOf(graft.operators.CurationPipeline.c4Clean(
      docs, "doc_id", "text"))
    assert(!c4.contains("Exchange"), s"shuffle in a pure map:\n$c4")
    assert(!c4.contains("Join"), s"join in a pure map:\n$c4")
  }

  test("lmPerplexity joins on the bigram key - no cartesian (t49 shape)") {
    import org.apache.spark.sql.functions.col
    graft.operators.PipelineContext.run { implicit ctx =>
      val plan = planOf(graft.operators.CurationPipeline.lmPerplexity(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        lmTarget = col("lang") === "en"))
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      ()
    }
  }
}
