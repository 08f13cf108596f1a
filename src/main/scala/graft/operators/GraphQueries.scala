package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.PatternQuery
import graft.query.PatternQuery.p
import graft.sources.TpchGraph

/** The PatternQuery (Cypher-semantics) engine run against the TPC-H
  * graph view so the graph layer itself sits under the DuckDB
  * differential gate: each query is a MATCH-pattern pipeline, each
  * oracle re-expresses it as the joins Cypher compiles to. */
object GraphQueries {

  /** MATCH (c:Customer)-[:CUSTOMER_IN_NATION]->(n)-[:NATION_IN_REGION]->(r),
    *       (c)-[:CUSTOMER_PLACED_ORDER]->(o)
    * RETURN r.name, count(o), sum(o.totalprice) — implicit grouping. */
  def g01MultiHop(spark: SparkSession, dir: String): DataFrame =
    PatternQuery.matchNode(new TpchGraph(spark, dir), "c", "Customer")
      // n is pure pass-through (no property touched) -> its node join
      // is elided under TpchGraph's declared FK integrity
      .out("CUSTOMER_IN_NATION", "c", "n", farProps = Some(Set.empty))
      .out("NATION_IN_REGION", "n", "r")
      .out("CUSTOMER_PLACED_ORDER", "c", "o")
      .returning(
        "region" -> p("r.name"),
        "order_cnt" -> count(p("o.identifier")),
        "total" -> round(sum(p("o.totalprice")), 2))
      .orderBy(col("region"))

  /** OPTIONAL MATCH: every customer row survives; count(o) counts only
    * matches (zero for order-less customers). */
  def g02OptionalMatch(spark: SparkSession, dir: String): DataFrame =
    PatternQuery.matchNode(new TpchGraph(spark, dir), "c", "Customer")
      // only o's key is counted -> the Order node join is elided; the
      // left join hits the single rel projection of orders
      .out("CUSTOMER_PLACED_ORDER", "c", "o", optional = true,
        farProps = Some(Set("identifier")))
      .returning(
        "identifier" -> p("c.identifier"),
        "order_cnt" -> count(p("o.identifier")))
      .orderBy(col("identifier"))

  /** WHERE + RETURN DISTINCT over a hop (metrics_service.py:237). */
  def g03Distinct(spark: SparkSession, dir: String): DataFrame =
    PatternQuery.matchNode(new TpchGraph(spark, dir), "c", "Customer")
      .out("CUSTOMER_IN_NATION", "c", "n")
      .where(p("c.acctbal") > 4000.0)
      .returningDistinct("nation" -> p("n.name"))
      .orderBy(col("nation"))

  /** Reverse hop + self-pair dedup predicate: nations sharing a region
    * (custom_graph_demo/05:99-110 collaboration shape), via an `in`
    * traversal from the region side. */
  def g04SelfPairs(spark: SparkSession, dir: String): DataFrame =
    PatternQuery.matchNode(new TpchGraph(spark, dir), "n1", "Nation")
      .out("NATION_IN_REGION", "n1", "r")
      .in("NATION_IN_REGION", "r", "n2")
      .where(p("n1.name") < p("n2.name"))
      .returning(
        "region" -> p("r.name"),
        "nation1" -> p("n1.name"),
        "nation2" -> p("n2.name"))
      .orderBy(col("region"), col("nation1"), col("nation2"))

  /** Conditional aggregation through the pattern engine:
    * count(CASE WHEN …) per group (facts_tool.py:140-142 shape). */
  def g05CaseAgg(spark: SparkSession, dir: String): DataFrame =
    PatternQuery.matchNode(new TpchGraph(spark, dir), "c", "Customer")
      .out("CUSTOMER_PLACED_ORDER", "c", "o")
      .returning(
        "mktsegment" -> p("c.mktsegment"),
        "finished" -> count(when(p("o.status") === "F", lit(1))),
        "open" -> count(when(p("o.status") === "O", lit(1))),
        "total" -> round(sum(p("o.totalprice")), 2))
      .orderBy(col("mktsegment"))

  /** Bounded BFS shortest-path length distribution over the whole
    * graph (GraphAlgorithms.shortestPaths) — oracled by a DuckDB
    * recursive CTE over the same FK-derived edge set. */
  def g06ShortestPaths(spark: SparkSession, dir: String): DataFrame =
    PipelineContext.materialize { implicit ctx =>
      GraphAlgorithms.shortestPaths(new TpchGraph(spark, dir), maxHops = 5)
        .groupBy(col("src_label"), col("dst_label"), col("dist"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("src_label"), col("dst_label"), col("dist"))
    }

  /** Degree statistics per relationship type (metrics surface). */
  def g07DegreeStats(spark: SparkSession, dir: String): DataFrame =
    GraphAlgorithms.degreeStats(new TpchGraph(spark, dir))
      .orderBy(col("rel_type"))

  /** g08: typed bounded var-length path `-[:R*1..3]->` through the full
    * Cypher text path (parser → compiler → PatternQuery.outVar) — the
    * last §2.3 row that was spec-only. TPC-H has no self-typed
    * relationship, so the gate derives one deterministically from the
    * orders table: ORDER_NEXT chains each customer's orders in
    * (o_orderdate, o_orderkey) order — the reference's graphs chain
    * same-label nodes the same way (Transaction/Process sequences,
    * roboledger). Reachable (a,b) pairs over 1..3 hops, grouped by
    * endpoint status. Scale shape: outVar is k bounded self-joins +
    * one distinct — each an equi-join shuffle on order keys, no
    * row-wise recursion. */
  def g08VarLength(spark: SparkSession, dir: String): DataFrame = {
    val store = orderChainStore(spark, dir)
    new graft.query.cypher.CypherCompiler(store).run(
      """MATCH (a:Order)-[:ORDER_NEXT*1..3]->(b:Order)
         RETURN a.status AS s1, b.status AS s2, count(*) AS n
         ORDER BY s1, s2""")
  }

  private def orderChainSchema = graft.schema.GraphSchema("orderchain", "1.0",
    Seq(graft.schema.NodeDef("Order", Seq(
      graft.schema.Property("identifier", graft.schema.GraftType.STRING,
        isPrimaryKey = true),
      graft.schema.Property("status", graft.schema.GraftType.STRING)))),
    Seq(graft.schema.RelDef("ORDER_NEXT", "Order", "Order")))

  /** Scratch graph: Order nodes + the derived ORDER_NEXT self-rel.
    * Built ONCE per (JVM, source dir) and cached: the store is
    * read-only after ingest, so repeated invocations (Bench warmup +
    * 3 passes, Steady) re-run the TRAVERSAL against the standing
    * store — the serving shape (a graph is ingested once and queried
    * many times), and what the g08 wall should measure. The scratch
    * root is wiped only when (re)building, so a cached store's files
    * are never deleted under an open reader. */
  private val chainStores = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (SparkSession, graft.storage.GraphStore)]()
  // keyed on (session, dir): a store captures its SparkSession, so a
  // session restart must rebuild rather than serve plans bound to the
  // stopped session. Every lookup first EVICTS entries whose session
  // has stopped (and removes their scratch roots) — a long-lived JVM
  // cycling sessions must not accumulate dead stores on heap or disk.
  private def orderChainStore(spark: SparkSession, dir: String): graft.storage.GraphStore = {
    val it = chainStores.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue._1.sparkContext.isStopped) {
        it.remove()
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(e.getValue._2.root)) // no readers: session dead
      }
    }
    chainStores.computeIfAbsent((sessionToken(spark), dir),
      _ => (spark, buildOrderChainStore(spark, dir)))._2
  }

  /** Identity token for a session instance (a restarted session is a
    * NEW instance and must not reuse the old instance's stores).
    * applicationId + context start time + identity hash: two live
    * instances can never share all three, unlike a bare
    * identityHashCode (which the JVM may reuse across instances). */
  private def sessionToken(spark: SparkSession): String =
    s"${spark.sparkContext.applicationId}-${spark.sparkContext.startTime}-" +
      Integer.toHexString(System.identityHashCode(spark))

  private def buildOrderChainStore(spark: SparkSession, dir: String) = {
    import org.apache.spark.sql.expressions.Window
    // per-(session, source-dir) root: two sf dirs cached in one JVM
    // (ScaleCheck tiers, mixed-sf tests) must not wipe each other's
    // live store. Base64(dir) is collision-free (a hash of the path
    // could alias two dirs onto one root and wipe a live store).
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-ggate",
      sessionToken(spark),
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(dir.getBytes("UTF-8")))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(root.toFile)
    val store = new graft.storage.GraphStore(spark,
      root.toString, "ggate", orderChainSchema)
    val orders = graft.sources.Tables.orders(spark, dir)
    store.ingestNodes("Order", orders.select(
      col("o_orderkey").cast("string").as("identifier"),
      col("o_orderstatus").as("status")))
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    store.ingestRels("ORDER_NEXT", orders
      .withColumn("next", lead(col("o_orderkey"), 1).over(byCust))
      .filter(col("next").isNotNull)
      .select(col("o_orderkey").cast("string").as("src"),
        col("next").cast("string").as("dst")))
    store
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_graph_multihop" -> g01MultiHop _,
    "g02_graph_optional" -> g02OptionalMatch _,
    "g03_graph_distinct" -> g03Distinct _,
    "g04_graph_selfpairs" -> g04SelfPairs _,
    "g05_graph_caseagg" -> g05CaseAgg _,
    "g06_shortest_paths" -> g06ShortestPaths _,
    "g07_degree_stats" -> g07DegreeStats _,
    "g08_varlength" -> g08VarLength _,
  )

  val oracle: Map[String, String] = Map(
    "g01_graph_multihop" ->
      """SELECT r_name AS region, count(o_orderkey) AS order_cnt,
         round(sum(o_totalprice), 2) AS total
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "g02_graph_optional" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS identifier,
         count(o_orderkey) AS order_cnt
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "g03_graph_distinct" ->
      """SELECT DISTINCT n_name AS nation
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_acctbal > 4000.0 ORDER BY 1""",
    "g04_graph_selfpairs" ->
      """SELECT r_name AS region, n1.n_name AS nation1, n2.n_name AS nation2
         FROM nation n1
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN nation n2 ON n2.n_regionkey = r_regionkey
         WHERE n1.n_name < n2.n_name
         ORDER BY 1, 2, 3""",
    "g07_degree_stats" ->
      """WITH deg AS (
           SELECT 'CUSTOMER_IN_NATION' AS rel_type, 'Customer' AS src_label,
                  'Nation' AS dst_label, CAST(c_custkey AS VARCHAR) AS src
           FROM customer
           UNION ALL
           SELECT 'CUSTOMER_PLACED_ORDER', 'Customer', 'Order',
                  CAST(o_custkey AS VARCHAR) FROM orders
           UNION ALL
           SELECT 'NATION_IN_REGION', 'Nation', 'Region',
                  CAST(n_nationkey AS VARCHAR) FROM nation
           UNION ALL
           SELECT 'SUPPLIER_IN_NATION', 'Supplier', 'Nation',
                  CAST(s_suppkey AS VARCHAR) FROM supplier
         ), per_src AS (
           SELECT rel_type, src_label, dst_label, src, count(*) AS d
           FROM deg GROUP BY 1, 2, 3, 4)
         SELECT rel_type, src_label, dst_label,
           count(*) AS n_src, CAST(sum(d) AS BIGINT) AS n_edges,
           max(d) AS max_out_degree, round(avg(d), 4) AS avg_out_degree
         FROM per_src GROUP BY 1, 2, 3 ORDER BY rel_type""",
    "g06_shortest_paths" ->
      """WITH RECURSIVE edges AS (
           SELECT DISTINCT * FROM (
             SELECT 'Nation' AS sl, CAST(n_nationkey AS VARCHAR) AS s,
                    'Region' AS dl, CAST(n_regionkey AS VARCHAR) AS d FROM nation
             UNION ALL
             SELECT 'Customer', CAST(c_custkey AS VARCHAR),
                    'Nation', CAST(c_nationkey AS VARCHAR) FROM customer
             UNION ALL
             SELECT 'Supplier', CAST(s_suppkey AS VARCHAR),
                    'Nation', CAST(s_nationkey AS VARCHAR) FROM supplier
             UNION ALL
             SELECT 'Customer', CAST(o_custkey AS VARCHAR),
                    'Order', CAST(o_orderkey AS VARCHAR) FROM orders)
         ), walk AS (
           SELECT sl, s, dl, d, 1 AS dist FROM edges
           UNION
           SELECT w.sl, w.s, e.dl, e.d, w.dist + 1
           FROM walk w JOIN edges e ON w.dl = e.sl AND w.d = e.s
           WHERE w.dist < 5
         ), shortest AS (
           SELECT sl, s, dl, d, min(dist) AS dist
           FROM walk GROUP BY 1, 2, 3, 4)
         SELECT sl AS src_label, dl AS dst_label, dist, count(*) AS n
         FROM shortest GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "g05_graph_caseagg" ->
      """SELECT c_mktsegment AS mktsegment,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open,
         round(sum(o_totalprice), 2) AS total
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "g08_varlength" ->
      """WITH e AS (
           SELECT o_orderkey AS src,
                  lead(o_orderkey) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS dst
           FROM orders),
         edges AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
         p2 AS (SELECT a.src, b.dst FROM edges a
                JOIN edges b ON a.dst = b.src),
         p3 AS (SELECT a.src, c.dst FROM edges a
                JOIN edges b ON a.dst = b.src
                JOIN edges c ON b.dst = c.src),
         pairs AS (
           SELECT DISTINCT src, dst FROM (
             SELECT * FROM edges
             UNION ALL SELECT * FROM p2
             UNION ALL SELECT * FROM p3))
         SELECT ao.o_orderstatus AS s1, bo.o_orderstatus AS s2,
                count(*) AS n
         FROM pairs
         JOIN orders ao ON pairs.src = ao.o_orderkey
         JOIN orders bo ON pairs.dst = bo.o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
