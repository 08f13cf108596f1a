package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.cypher.CypherCompiler
import graft.sources.TpchGraph

/** The full Cypher path (parse → compile → PatternQuery → Catalyst)
  * under the DuckDB differential gate, over the TPC-H graph view.
  * These exercise the exact text-to-result pipeline a reference user
  * would hit via POST /v1/graphs/{id}/query. */
object CypherQueries {

  private def run(spark: SparkSession, dir: String, q: String,
      params: Map[String, Any] = Map.empty): DataFrame =
    new CypherCompiler(new TpchGraph(spark, dir), params).run(q)

  def c01MultiHop(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[:CUSTOMER_IN_NATION]->(n:Nation)
               -[:NATION_IN_REGION]->(r:Region)
         MATCH (c)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN r.name AS region, count(o) AS order_cnt,
                round(sum(o.totalprice), 2) AS total
         ORDER BY region""")

  def c02Optional(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)
         OPTIONAL MATCH (c)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN c.identifier AS identifier, count(o) AS order_cnt
         ORDER BY identifier""")

  def c03Predicates(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         WHERE c.mktsegment IN $segments AND o.status <> 'P'
               AND o.totalprice >= $minTotal
         RETURN c.identifier AS cust, round(sum(o.totalprice), 2) AS spend
         ORDER BY spend DESC, cust LIMIT 25""",
      Map("segments" -> Seq("BUILDING", "MACHINERY"), "minTotal" -> 1000.0))

  def c04CaseAgg(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN c.mktsegment AS mktsegment,
                count(CASE WHEN o.status = 'F' THEN 1 END) AS finished,
                sum(CASE WHEN o.totalprice > 300000.0 THEN 1 ELSE 0 END) AS big,
                round(avg(o.totalprice), 2) AS avg_price
         ORDER BY mktsegment""")

  def c05WithHaving(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (n:Nation)<-[:CUSTOMER_IN_NATION]-(c:Customer)
         WITH n, count(c) AS customers
         WHERE customers > 30
         RETURN n.name AS nation, customers
         ORDER BY nation""")

  /** Any-rel pattern — the exact shape the reference's financial agent
    * emits (robosystems/operations/agents/financial.py:411-412:
    * `MATCH (e:Entity)-[r]->(n) RETURN type(r), count(*)`), over the
    * TPC-H graph's Customer as the anchor label. */
  def c06AnyRel(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[r]->(n)
         RETURN type(r) AS rel_type, count(*) AS cnt
         ORDER BY rel_type""")

  /** Label-less node scan — metrics_service.py:262
    * (`MATCH (n) RETURN label(n), count(n)`). */
  def c07AnyNode(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (n)
         RETURN label(n) AS label, count(n) AS cnt
         ORDER BY label""")

  /** Undirected relationship — both orientations unioned; each
    * (customer, nation) pair appears once per matching orientation
    * (here only Customer->Nation exists, so once). */
  def c08Undirected(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (n:Nation)-[:CUSTOMER_IN_NATION]-(c:Customer)
         RETURN n.name AS nation, count(c) AS customers
         ORDER BY nation""")

  /** Fully-anonymous any-rel scan — metrics_service.py:274
    * (`MATCH ()-[r]->() RETURN DISTINCT LABEL(r)`). */
  def c09RelTypes(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH ()-[r]->()
         RETURN DISTINCT label(r) AS rel_type
         ORDER BY rel_type""")

  /** UNWIND under the differential gate: list explode cross-joined
    * with a MATCH, implicit grouping over both. */
  def c10Unwind(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)
         UNWIND [1, 2] AS bucket
         RETURN c.mktsegment AS seg, bucket, count(*) AS n
         ORDER BY seg, bucket""")

  /** Any-type bounded var-length: reachability from Region through 1-2
    * hops of ANY relationship (inbound), label-tagged endpoints. */
  def c11VarAny(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (r:Region)<-[*1..2]-(n)
         RETURN label(n) AS lbl, count(*) AS cnt
         ORDER BY lbl""")

  /** Statistical aggregates (facts_tool.py analysis surface): sample
    * stddev per group, integer-rounded so the differential is robust to
    * last-ulp algorithm differences. percentileCont is spec-gated
    * instead (CypherSpec): interpolated quantiles land on either side
    * of a rounding boundary across engines (`a+(b-a)·f` vs `(a+b)/2`
    * differ in the last ulp), so no rounding makes them hash-stable. */
  def c12Stats(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[:CUSTOMER_PLACED_ORDER]->(o:Order)
         RETURN c.mktsegment AS seg,
                toInteger(round(STDEV(o.totalprice), 0)) AS sd,
                count(*) AS n
         ORDER BY seg""")

  /** EXISTS / NOT EXISTS pattern predicates — facts_tool.py's
    * dimension-filter shape (`AND NOT EXISTS((f)-[:FACT_HAS_DIMENSION]
    * ->())`) — both polarities as semi/anti joins in one UNION (the
    * testdata gives every customer orders, so the two branches keep
    * the row count nonzero and still pin the anti side's zero). */
  def c13Exists(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)
         WHERE EXISTS((c)-[:CUSTOMER_PLACED_ORDER]->(o:Order))
               AND c.acctbal > 0
         RETURN 'with_orders' AS grp, count(c) AS cnt
         UNION ALL
         MATCH (c:Customer)
         WHERE NOT EXISTS((c)-[:CUSTOMER_PLACED_ORDER]->(o:Order))
               AND c.acctbal > 0
         RETURN 'without_orders' AS grp, count(c) AS cnt
         ORDER BY grp""")

  /** MATCH after WITH — save_view.py's count-then-rematch statement
    * shape: aggregate, then open a new pattern segment whose result
    * cross-joins the carried scalar. */
  def c14Rematch(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer) WITH count(c) AS total_customers
         MATCH (r:Region)
         RETURN r.name AS region, total_customers
         ORDER BY region""")

  /** ILIKE + parameterized LIMIT (custom_graph_demo README;
    * agents/context.py `RETURN n LIMIT $limit`). */
  def c15IlikeParamLimit(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer) WHERE c.mktsegment ILIKE '%build%'
         RETURN c.identifier AS cust
         ORDER BY cust LIMIT $lim""",
      Map("lim" -> 10))

  /** Any-rel hop with a PROPERTY access on the untyped rel var —
    * the sparse-supertype projection ([[graft.query.PatternQuery
    * .sparseRelPropCols]], previously spec-only): Customer's out-rels
    * are CUSTOMER_IN_NATION (no properties) and CUSTOMER_PLACED_ORDER
    * (declares `price`), so `r.price` is the rel's own column on one
    * branch and a typed null on the other. The oracle replays the
    * two-branch union relationally — per-type counts plus a total that
    * only the prop-carrying branch contributes to. */
  def c16AnyRelProp(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir,
      """MATCH (c:Customer)-[r]->(n)
         RETURN type(r) AS rel_type, count(*) AS cnt,
                round(sum(r.price), 2) AS total_price
         ORDER BY rel_type""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_cypher_multihop" -> c01MultiHop _,
    "c02_cypher_optional" -> c02Optional _,
    "c03_cypher_predicates" -> c03Predicates _,
    "c04_cypher_caseagg" -> c04CaseAgg _,
    "c05_cypher_with_having" -> c05WithHaving _,
    "c06_cypher_anyrel" -> c06AnyRel _,
    "c07_cypher_anynode" -> c07AnyNode _,
    "c08_cypher_undirected" -> c08Undirected _,
    "c09_cypher_reltypes" -> c09RelTypes _,
    "c10_cypher_unwind" -> c10Unwind _,
    "c11_cypher_varany" -> c11VarAny _,
    "c12_cypher_stats" -> c12Stats _,
    "c13_cypher_exists" -> c13Exists _,
    "c14_cypher_rematch" -> c14Rematch _,
    "c15_cypher_ilike" -> c15IlikeParamLimit _,
    "c16_cypher_anyrel_prop" -> c16AnyRelProp _,
  )

  val oracle: Map[String, String] = Map(
    "c01_cypher_multihop" ->
      """SELECT r_name AS region, count(o_orderkey) AS order_cnt,
         round(sum(o_totalprice), 2) AS total
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "c02_cypher_optional" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS identifier,
         count(o_orderkey) AS order_cnt
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "c03_cypher_predicates" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS cust,
         round(sum(o_totalprice), 2) AS spend
         FROM customer JOIN orders ON o_custkey = c_custkey
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           AND o_orderstatus <> 'P' AND o_totalprice >= 1000.0
         GROUP BY 1 ORDER BY spend DESC, cust LIMIT 25""",
    "c04_cypher_caseagg" ->
      """SELECT c_mktsegment AS mktsegment,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished,
         CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS big,
         round(avg(o_totalprice), 2) AS avg_price
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "c05_cypher_with_having" ->
      """SELECT n_name AS nation, count(c_custkey) AS customers
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         GROUP BY 1 HAVING count(c_custkey) > 30 ORDER BY 1""",
    "c06_cypher_anyrel" ->
      """SELECT rel_type, cnt FROM (
           SELECT 'CUSTOMER_IN_NATION' AS rel_type, count(*) AS cnt
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           UNION ALL
           SELECT 'CUSTOMER_PLACED_ORDER' AS rel_type, count(*) AS cnt
           FROM orders JOIN customer ON o_custkey = c_custkey
         ) ORDER BY rel_type""",
    "c07_cypher_anynode" ->
      """SELECT label, cnt FROM (
           SELECT 'Customer' AS label, count(*) AS cnt FROM customer
           UNION ALL SELECT 'Nation', count(*) FROM nation
           UNION ALL SELECT 'Order', count(*) FROM orders
           UNION ALL SELECT 'Region', count(*) FROM region
           UNION ALL SELECT 'Supplier', count(*) FROM supplier
         ) ORDER BY label""",
    "c08_cypher_undirected" ->
      """SELECT n_name AS nation, count(c_custkey) AS customers
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "c12_cypher_stats" ->
      """SELECT c_mktsegment AS seg,
         CAST(round(stddev_samp(o_totalprice), 0) AS BIGINT) AS sd,
         count(*) AS n
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "c10_cypher_unwind" ->
      """SELECT c_mktsegment AS seg, bucket, count(*) AS n
         FROM customer CROSS JOIN (SELECT unnest([1, 2]::BIGINT[]) AS bucket)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "c11_cypher_varany" ->
      """SELECT lbl, cnt FROM (
           SELECT 'Nation' AS lbl, count(*) AS cnt FROM (
             SELECT DISTINCT n_nationkey, n_regionkey FROM nation
               JOIN region ON n_regionkey = r_regionkey)
           UNION ALL
           SELECT 'Customer', count(*) FROM (
             SELECT DISTINCT c_custkey, n_regionkey FROM customer
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey)
           UNION ALL
           SELECT 'Supplier', count(*) FROM (
             SELECT DISTINCT s_suppkey, n_regionkey FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey)
         ) ORDER BY lbl""",
    "c09_cypher_reltypes" ->
      """SELECT DISTINCT rel_type FROM (
           SELECT 'CUSTOMER_IN_NATION' AS rel_type FROM customer
             JOIN nation ON c_nationkey = n_nationkey
           UNION ALL SELECT 'CUSTOMER_PLACED_ORDER' FROM orders
             JOIN customer ON o_custkey = c_custkey
           UNION ALL SELECT 'NATION_IN_REGION' FROM nation
             JOIN region ON n_regionkey = r_regionkey
           UNION ALL SELECT 'SUPPLIER_IN_NATION' FROM supplier
             JOIN nation ON s_nationkey = n_nationkey
         ) ORDER BY rel_type""",
    "c13_cypher_exists" ->
      // GROUP BY the literal tag: Cypher's implicit grouping treats
      // every non-aggregate RETURN item as a key, so an empty branch
      // yields ZERO rows (not a 0-count row) — the SQL must match
      """SELECT 'with_orders' AS grp, count(*) AS cnt FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND c_acctbal > 0 GROUP BY 1
         UNION ALL
         SELECT 'without_orders' AS grp, count(*) AS cnt FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND c_acctbal > 0 GROUP BY 1
         ORDER BY grp""",
    "c14_cypher_rematch" ->
      """SELECT r_name AS region,
         (SELECT count(*) FROM customer) AS total_customers
         FROM region ORDER BY 1""",
    "c15_cypher_ilike" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS cust
         FROM customer WHERE c_mktsegment ILIKE '%build%'
         ORDER BY 1 LIMIT 10""",
    // sparse union: IN_NATION contributes typed-null prices (DuckDB
    // sum over all-NULL = NULL, as Spark), PLACED_ORDER its own column
    "c16_cypher_anyrel_prop" ->
      """SELECT rel_type, cnt, total_price FROM (
           SELECT 'CUSTOMER_IN_NATION' AS rel_type, count(*) AS cnt,
                  round(sum(CAST(NULL AS DOUBLE)), 2) AS total_price
           FROM customer
           UNION ALL
           SELECT 'CUSTOMER_PLACED_ORDER', count(*),
                  round(sum(o_totalprice), 2)
           FROM orders)
         ORDER BY rel_type""",
  )
}
