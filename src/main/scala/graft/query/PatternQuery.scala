package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.graft.ColumnInternals
import graft.schema.RelDef
import graft.storage.GraphSource

/** Cypher-pattern semantics compiled to DataFrame relational algebra
  * (SURVEY.md §2.2-2.7). A `MATCH (a)-[:R]->(b)` hop is two equi-joins
  * over the node/rel tables (robosystems trial_balance.py:37-39);
  * `OPTIONAL MATCH` is a left outer join whose right side is the
  * pre-joined rel⋈node subtree (fact_query.py:53-55); `returning`
  * applies Cypher's implicit grouping — every non-aggregate item is a
  * grouping key (§2.4, the #1 semantic difference vs SQL).
  *
  * Columns are namespaced `var__prop` ("e"."name" → `e__name`,
  * addressable via [[PatternQuery.p]]). All joins are key-equi joins so
  * Catalyst plans broadcast-hash for dimension-sized node tables and
  * sort-merge (with AQE skew splitting) for fact-sized ones — nothing
  * here forces a physical strategy, and predicates pushed through
  * `where` reach the parquet scans.
  */
final class PatternQuery private (
    private val store: GraphSource,
    private val frame: DataFrame,
    /** node variable → label */
    private val nodeVars: Map[String, String],
    /** all bound variables incl. relationship vars */
    private val boundVars: Set[String]) {

  private def namespaced(df: DataFrame, v: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"${v}__$c")).toIndexedSeq: _*)

  private def requireBound(v: String): Unit =
    require(nodeVars.contains(v), s"node variable $v not bound (have: ${nodeVars.keySet})")

  private def requireFresh(v: String): Unit =
    require(!boundVars.contains(v), s"variable $v already bound")

  private def pkCol(v: String): String =
    if (nodeVars(v) == PatternQuery.AnyLabel) s"${v}____pk"
    else s"${v}__${store.schema.node(nodeVars(v)).primaryKey}"

  /** Additional disconnected `MATCH` — an explicit cartesian product
    * (custom_graph_demo/05:99-103; Spark requires explicit crossJoin). */
  def alsoMatch(v: String, label: String): PatternQuery = {
    requireFresh(v)
    new PatternQuery(store, frame.crossJoin(namespaced(store.node(label), v)),
      nodeVars + (v -> label), boundVars + v)
  }

  /** `(from)-[:relType]->(v)`; v's label is the schema's declared
    * to-node. `optional=true` = OPTIONAL MATCH (left join keeping the
    * left row; the hop's columns become null). `relVar` exposes the
    * relationship's own properties as `relVar__prop`. */
  def out(relType: String, from: String, v: String,
      optional: Boolean = false, relVar: String = null,
      farProps: Option[Set[String]] = None): PatternQuery =
    hop(relType, from, v, forward = true, optional, Option(relVar), farProps)

  /** `(from)<-[:relType]-(v)` reversed hop. */
  def in(relType: String, from: String, v: String,
      optional: Boolean = false, relVar: String = null,
      farProps: Option[Set[String]] = None): PatternQuery =
    hop(relType, from, v, forward = false, optional, Option(relVar), farProps)

  /** The single-frame right side of a hop: the rel table alone when the
    * far node's join is elidable (FK integrity + only the pk referenced
    * — the join can neither drop nor duplicate rows, so it's pure
    * cost), the source's fused rel⋈dst-node frame when the rel derives
    * from the dst node's own storage rows (one scan instead of two),
    * or the classic rel ⋈ node join. `farProps = None` means "unknown
    * usage" and always takes the full join. */
  private def hopRight(relType: String, v: String, rv: String,
      forward: Boolean, farProps: Option[Set[String]]): (DataFrame, String) = {
    val relDef = store.schema.rel(relType)
    val targetLabel = if (forward) relDef.to else relDef.from
    val targetDef = store.schema.node(targetLabel)
    val toPk = s"${v}__${targetDef.primaryKey}"
    val farRaw = if (forward) "dst" else "src"
    val pkOnly = store.referentialIntegrity &&
      farProps.exists(_.subsetOf(Set(targetDef.primaryKey)))
    val right =
      if (pkOnly) {
        val pkType = targetDef.properties.find(_.isPrimaryKey).get.tpe.spark
        namespaced(
          store.rel(relType).withColumn(s"__elided_pk", col(farRaw).cast(pkType)), rv)
          .withColumnRenamed(s"${rv}____elided_pk", toPk)
      } else store.relWithDstNode(relType) match {
        // the fused frame must carry every column the hop serves: all
        // dst-NODE properties plus the rel's own declared properties
        // (as columns of their declared names). A fused frame missing
        // a rel prop falls back to the join path — `rv__prop`
        // references must never silently vanish
        case Some(fused) if forward &&
            relDef.properties.forall(p => fused.columns.contains(p.name)) =>
          val nodeCols = targetDef.properties.map(_.name)
          fused.select(
            col("src").as(s"${rv}__src") +: col("dst").as(s"${rv}__dst") +:
              (relDef.properties.map(p => col(p.name).as(s"${rv}__${p.name}")) ++
                nodeCols.map(c => col(c).as(s"${v}__$c"))): _*)
        case _ =>
          val relDf = namespaced(store.rel(relType), rv)
          val farKey = s"${rv}__$farRaw"
          relDf.join(namespaced(store.node(targetLabel), v),
            col(farKey) === col(toPk))
      }
    (right, targetLabel)
  }

  private def hop(relType: String, from: String, v: String,
      forward: Boolean, optional: Boolean, relVar: Option[String],
      farProps: Option[Set[String]]): PatternQuery = {
    requireBound(from); requireFresh(v)
    val rv = relVar.getOrElse(s"__r_${relType}_$v")
    val nearKey = if (forward) s"${rv}__src" else s"${rv}__dst"
    val fromPk = pkCol(from)
    // The right side is pre-assembled as ONE frame, so OPTIONAL MATCH
    // is a single left join and the whole subtree nulls out together
    // (fact_query.py:53-55).
    val (right, targetLabel) = hopRight(relType, v, rv, forward, farProps)
    val next = frame.join(right, col(fromPk) === col(nearKey),
      if (optional) "left" else "inner")
    new PatternQuery(store, next, nodeVars + (v -> targetLabel), boundVars + v + rv)
  }

  /** OPTIONAL MATCH of a whole multi-hop path with an optional
    * pattern-local predicate: the subtree (rel⋈node⋈rel⋈node…,
    * filtered) is built independently and left-joined ONCE, so (a) the
    * entire optional pattern nulls out together — Cypher's semantics
    * when any part fails to match — and (b) the predicate applies
    * before the join, preserving left rows (a post-join filter would
    * silently drop them). The predicate may reference only this path's
    * own variables. Hops: (relType, relVar, nodeVar, rightward). */
  def optionalPath(
      from: String,
      hops: Seq[(String, String, String, Boolean)],
      pathFilter: Option[Column] = None,
      farProps: String => Option[Set[String]] = _ => None): PatternQuery = {
    requireBound(from)
    require(hops.nonEmpty, "optional path needs at least one hop")
    var curLabel = nodeVars(from)
    var newVars = Map.empty[String, String]
    var subtree: DataFrame = null
    var firstKey: String = null
    hops.foreach { case (relType, rv, v, rightward) =>
      requireFresh(v); require(!boundVars.contains(rv), s"rel var $rv bound")
      val nearKey = if (rightward) s"${rv}__src" else s"${rv}__dst"
      val (hopDf, targetLabel) = hopRight(relType, v, rv, rightward, farProps(v))
      if (subtree == null) { subtree = hopDf; firstKey = nearKey }
      else {
        val prevVar = hops(hops.indexWhere(_._3 == v) - 1)._3
        val prevPk = s"${prevVar}__${store.schema.node(newVars(prevVar)).primaryKey}"
        subtree = subtree.join(hopDf, col(prevPk) === col(nearKey))
      }
      newVars += (v -> targetLabel)
      curLabel = targetLabel
    }
    val filtered = pathFilter.fold(subtree)(subtree.filter)
    new PatternQuery(store,
      frame.join(filtered, col(pkCol(from)) === col(firstKey), "left"),
      nodeVars ++ newVars,
      boundVars ++ newVars.keySet ++ hops.map(_._2))
  }

  /** Generalized hop for the pattern forms that have no single rel
    * table: untyped `-[r]->`, undirected `-[:R]-`, and label-less far
    * nodes — the shapes the reference's agents and metrics emit
    * (financial.py:411-412 `MATCH (e)-[r]->(n) RETURN type(r)`,
    * metrics_service.py:274 `MATCH ()-[r]->()`).
    *
    * Compiles as a UNION of per-(relType, orientation) branches, each a
    * typed equi-join tagged with literal `relVar__rel_type` /
    * `relVar__near_label` columns. Candidate branches are pruned by the
    * SCHEMA (near-endpoint label must match the bound var's label;
    * primary keys are only unique per label, so any-label near sides
    * also join on the tag column). The union is linear in the number of
    * rel TYPES, not rows; per-branch filters/broadcasts still apply, so
    * this scales like N typed hops, and Catalyst prunes never-matching
    * branches via the literal equality. The far node exposes full
    * columns when `toLabel` narrows it; otherwise only
    * `v____label`/`v____pk` ([[PatternQuery.AnyLabel]]). Rel properties
    * referenced by the query (`relProps`; `None` = the var is carried
    * whole, expose every property any candidate type declares) surface
    * as SPARSE `relVar__prop` columns — null on branches whose type
    * lacks the property, widened to string when candidate types
    * disagree on the type ([[PatternQuery.sparseRelPropCols]]).
    * `relTypes = None` means all schema types, `dirOut`/`dirIn` select
    * orientations (both = undirected). */
  def unionHop(from: String, v: String, relVar: String,
      relTypes: Option[Seq[String]], dirOut: Boolean, dirIn: Boolean,
      toLabel: Option[String] = None,
      farProps: Option[Set[String]] = None,
      relProps: Option[Set[String]] = Some(Set.empty)): PatternQuery = {
    requireBound(from); requireFresh(v)
    require(dirOut || dirIn, "hop needs at least one orientation")
    require(!boundVars.contains(relVar), s"rel variable $relVar already bound")
    val fromLabel = nodeVars(from)
    val rels = relTypes.fold(store.schema.rels.toSeq)(ts => ts.map(store.schema.rel))
    // (relDef, forward?) branches consistent with the endpoint labels
    val candidates = for {
      r <- rels
      forward <- Seq(true, false)
      if (if (forward) dirOut else dirIn)
      (nearL, farL) = if (forward) (r.from, r.to) else (r.to, r.from)
      if fromLabel == PatternQuery.AnyLabel || nearL == fromLabel
      if toLabel.forall(_ == farL)
    } yield (r, forward)
    require(candidates.nonEmpty,
      s"no relationship type connects ($fromLabel)${if (dirIn) "<" else ""}-" +
        s"${relTypes.fold("")(_.mkString("[:", "|", "]"))}-${if (dirOut) ">" else ""}" +
        s"(${toLabel.getOrElse("")}) in schema ${store.schema.name}")
    val propCols = PatternQuery.sparseRelPropCols(
      candidates.map(_._1).distinct, relVar, relProps)
    val branches = candidates.map { case (r, forward) =>
      val (nearL, farL) = if (forward) (r.from, r.to) else (r.to, r.from)
      // src/dst cast to string: key columns join against string-typed
      // synthetic pks (`__pk`) and possibly non-string node pks — a
      // numeric-vs-string equality would coerce BOTH sides to double
      // and silently lose exactness for 64-bit ids above 2^53
      val rel = store.rel(r.name).select(
        lit(r.name).as(s"${relVar}__rel_type") +:
          lit(nearL).as(s"${relVar}__near_label") +:
          col(if (forward) "src" else "dst").cast("string").as(s"${relVar}__near") +:
          col(if (forward) "dst" else "src").cast("string").as(s"${relVar}__far") +:
          propCols(r): _*)
      // With declared FK integrity and only key/label access on the far
      // node, the per-branch node join is elidable: the key IS the rel's
      // far column and the label is the branch literal (e.g. the agent
      // shape `MATCH (e:Entity)-[r]->(n) RETURN type(r), count(*)` needs
      // no node scans at all).
      val farPkOnly = store.referentialIntegrity && farProps.exists(ps =>
        ps.subsetOf(toLabel.map(l => Set(store.schema.node(l).primaryKey))
          .getOrElse(Set.empty)))
      toLabel match {
        case Some(l) if farPkOnly =>
          val d = store.schema.node(l)
          rel.withColumn(s"${v}__${d.primaryKey}",
            col(s"${relVar}__far").cast(
              d.properties.find(_.isPrimaryKey).get.tpe.spark))
        case Some(l) =>
          val toPk = s"${v}__${store.schema.node(l).primaryKey}"
          rel.join(namespaced(store.node(l), v),
            col(s"${relVar}__far") === col(toPk).cast("string"))
        case None if farPkOnly =>
          rel.withColumn(s"${v}____label", lit(farL))
            .withColumn(s"${v}____pk", col(s"${relVar}__far"))
        case None =>
          val farPk = store.schema.node(farL).primaryKey
          rel.join(
            store.node(farL).select(
              lit(farL).as(s"${v}____label"),
              col(farPk).cast("string").as(s"${v}____pk")),
            col(s"${relVar}__far") === col(s"${v}____pk"))
      }
    }
    val unioned = branches.reduce(_ unionByName _)
    val joinCond =
      if (fromLabel == PatternQuery.AnyLabel)
        col(pkCol(from)) === col(s"${relVar}__near") &&
          col(s"${from}____label") === col(s"${relVar}__near_label")
      else col(pkCol(from)).cast("string") === col(s"${relVar}__near")
    new PatternQuery(store, frame.join(unioned, joinCond),
      nodeVars + (v -> toLabel.getOrElse(PatternQuery.AnyLabel)),
      boundVars + v + relVar)
  }

  /** Close a cycle: `(from)-[:relType]->(to)` where BOTH endpoints are
    * already bound — joins only the relationship table and constrains
    * dst to `to`'s key (the conjunctive-pattern case of
    * custom_graph_demo/05:99-104: `(p2)-[:WORKS_ON]->(proj)` with proj
    * bound by an earlier path). */
  def closeHop(relType: String, from: String, to: String,
      relVar: String = null): PatternQuery = {
    requireBound(from); requireBound(to)
    val rv = Option(relVar).getOrElse(s"__r_${relType}_${from}_$to")
    require(!boundVars.contains(rv), s"rel variable $rv already bound")
    val relDf = namespaced(store.rel(relType), rv)
    new PatternQuery(store,
      frame.join(relDf,
        col(pkCol(from)) === col(s"${rv}__src") &&
          col(pkCol(to)) === col(s"${rv}__dst")),
      nodeVars, boundVars + rv)
  }

  /** Bounded variable-length path `-[:R*min..max]->`: iterative join
    * expansion unioned across lengths. The reference's validator caps
    * paths at 5 hops (query_validator.py:416-429); unbounded recursion
    * is not supported by design. */
  def outVar(relType: String, from: String, v: String,
      minHops: Int, maxHops: Int, rightward: Boolean = true): PatternQuery = {
    require(minHops >= 1 && maxHops >= minHops && maxHops <= 5,
      "variable-length paths are bounded to 1..5 hops")
    requireBound(from); requireFresh(v)
    val relDef = store.schema.rel(relType)
    require(relDef.from == relDef.to || maxHops == 1,
      s"multi-hop expansion needs a self-typed relationship, got ${relDef.from}->${relDef.to}")
    // The far endpoint of a leftward hop is the rel's FROM node (mirrors
    // hop()): (n)<-[:R*1..1]-(c) reaches R's source label, not its target.
    val targetLabel = if (rightward) relDef.to else relDef.from
    val pk = store.schema.node(targetLabel).primaryKey
    // leftward patterns traverse the reversed edge set
    val edges =
      if (rightward) store.rel(relType).select(col("src"), col("dst"))
      else store.rel(relType).select(col("dst").as("src"), col("src").as("dst"))
    var paths = edges
    var acc: DataFrame = if (minHops == 1) edges else null
    for (k <- 2 to maxHops) {
      paths = paths.as("a")
        .join(edges.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      if (k >= minHops) acc = if (acc == null) paths else acc.unionByName(paths)
    }
    val reach = acc.distinct()
      .select(col("src").as("__v_src"), col("dst").as("__v_dst"))
    val nodeDf = namespaced(store.node(targetLabel), v)
    new PatternQuery(store,
      frame.join(reach, col(pkCol(from)) === col("__v_src"))
        .join(nodeDf, col("__v_dst") === col(s"${v}__$pk"))
        .drop("__v_src", "__v_dst"),
      nodeVars + (v -> targetLabel), boundVars + v)
  }

  /** Bounded var-length path over ANY relationship type
    * `-[*min..max]->`: reachability on the union of all rel tables.
    * Because primary keys are only unique per label, edges carry their
    * endpoint LABELS — (src_label, src, dst_label, dst) — and chain
    * hops join on the (label, key) pair, so a Nation key can never
    * continue through a Region edge. The far node is label-less
    * ([[PatternQuery.AnyLabel]]) unless `toLabel` narrows it. Same 1..5
    * bound as the typed expansion (reference validator,
    * query_validator.py:416-429). */
  def outVarAny(from: String, v: String, minHops: Int, maxHops: Int,
      rightward: Boolean = true, toLabel: Option[String] = None): PatternQuery = {
    require(minHops >= 1 && maxHops >= minHops && maxHops <= 5,
      "variable-length paths are bounded to 1..5 hops")
    requireBound(from); requireFresh(v)
    val fromLabel = nodeVars(from)
    val edges = store.schema.rels.map { r =>
      val (sl, s, dl, d) =
        if (rightward) (r.from, "src", r.to, "dst")
        else (r.to, "dst", r.from, "src")
      store.rel(r.name).select(
        lit(sl).as("sl"), col(s).cast("string").as("s"),
        lit(dl).as("dl"), col(d).cast("string").as("d"))
    }.reduce(_ unionByName _)
    // anchor the expansion on the bound label so the path frontier
    // never carries unreachable branches
    val e0 =
      if (fromLabel == PatternQuery.AnyLabel) edges
      else edges.filter(col("sl") === lit(fromLabel))
    var paths = e0
    var acc: DataFrame = if (minHops == 1) e0 else null
    for (k <- 2 to maxHops) {
      paths = paths.as("a")
        .join(edges.as("b"),
          col("a.dl") === col("b.sl") && col("a.d") === col("b.s"))
        .select(col("a.sl").as("sl"), col("a.s").as("s"),
          col("b.dl").as("dl"), col("b.d").as("d"))
      if (k >= minHops) acc = if (acc == null) paths else acc.unionByName(paths)
    }
    val narrowed = toLabel.fold(acc)(l => acc.filter(col("dl") === lit(l)))
    val reach = narrowed.distinct()
      .select(col("sl").as("__v_sl"), col("s").as("__v_s"),
        col("dl").as("__v_dl"), col("d").as("__v_d"))
    val fromCond =
      if (fromLabel == PatternQuery.AnyLabel)
        col(pkCol(from)) === col("__v_s") &&
          col(s"${from}____label") === col("__v_sl")
      else col(pkCol(from)).cast("string") === col("__v_s")
    val joined = frame.join(reach, fromCond)
    val next = toLabel match {
      case Some(l) =>
        val pk = store.schema.node(l).primaryKey
        joined.join(namespaced(store.node(l), v),
          col("__v_d") === col(s"${v}__$pk").cast("string"))
          .drop("__v_sl", "__v_s", "__v_dl", "__v_d")
      case None =>
        joined
          .withColumn(s"${v}____label", col("__v_dl"))
          .withColumn(s"${v}____pk", col("__v_d"))
          .drop("__v_sl", "__v_s", "__v_dl", "__v_d")
    }
    new PatternQuery(store, next,
      nodeVars + (v -> toLabel.getOrElse(PatternQuery.AnyLabel)), boundVars + v)
  }

  /** `[NOT] EXISTS((v)-[:R]->(w?))` — left-semi (anti when `negated`)
    * join of the frame against the relationship table's endpoint keys
    * (facts_tool.py's dimension-filter predicate). Adds no columns and
    * never duplicates rows — exactly the pattern-predicate semantics;
    * at scale this is one key-projected scan of the rel table,
    * broadcast when small.
    *
    * A label-less (AnyLabel) anchor also constrains its LABEL column
    * against the rel type's schema endpoint — primary keys are only
    * unique per label, so a bare key join would let a Supplier whose
    * key string collides with a Customer key satisfy a customer-side
    * EXISTS. When the pattern's far endpoint is ALSO a bound variable
    * (`EXISTS((a)-[:R]->(b))` with both bound), `farBound` joins both
    * keys so the predicate tests the specific pair, not "a has any R". */
  def existsHop(relType: String, from: String, forward: Boolean,
      negated: Boolean, farBound: Option[String] = None): PatternQuery = {
    requireBound(from)
    val d = store.schema.rel(relType)
    val (nearKey, farKey) = if (forward) ("src", "dst") else ("dst", "src")
    val (nearLabel, farLabel) = if (forward) (d.from, d.to) else (d.to, d.from)
    val relKeys = store.rel(relType).select(
      col(nearKey).cast("string").as("__exists_near"),
      col(farKey).cast("string").as("__exists_far"))
    def anchorCond(v: String, keyCol: String, label: String) = {
      val key = col(pkCol(v)).cast("string") === col(keyCol)
      if (nodeVars(v) == PatternQuery.AnyLabel)
        key && col(s"${v}____label") === lit(label)
      else key
    }
    val cond = farBound.foldLeft(anchorCond(from, "__exists_near", nearLabel)) {
      (c, fv) => requireBound(fv); c && anchorCond(fv, "__exists_far", farLabel)
    }
    new PatternQuery(store,
      frame.join(relKeys, cond, if (negated) "left_anti" else "left_semi"),
      nodeVars, boundVars)
  }

  /** WHERE over any bound variables' properties (use [[PatternQuery.p]]). */
  def where(cond: Column): PatternQuery =
    new PatternQuery(store, frame.filter(cond), nodeVars, boundVars)

  /** Raw access for composition / debugging / explain. */
  def df: DataFrame = frame

  /** Bound node variables and their labels (for compilers layered on
    * top, e.g. the Cypher front end). */
  def variables: Map[String, String] = nodeVars

  /** RETURN with Cypher implicit grouping: items whose expression
    * contains an aggregate become aggregates; all other items become
    * grouping keys. With no aggregates this is a plain projection. */
  def returning(items: (String, Column)*): DataFrame = {
    val (aggs, keys) = items.partition { case (_, c) => PatternQuery.isAggregate(c) }
    if (aggs.isEmpty) frame.select(items.map { case (n, c) => c.as(n) }: _*)
    else {
      val grouped =
        if (keys.isEmpty) frame.agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, c) => c.as(n) }: _*)
        else frame
          .groupBy(keys.map { case (n, c) => c.as(n) }: _*)
          .agg(aggs.head._2.as(aggs.head._1),
            aggs.tail.map { case (n, c) => c.as(n) }: _*)
      // restore the caller's item order
      grouped.select(items.map { case (n, _) => col(n) }: _*)
    }
  }

  /** RETURN DISTINCT (metrics_service.py:237). */
  def returningDistinct(items: (String, Column)*): DataFrame =
    returning(items: _*).distinct()
}

object PatternQuery {

  /** Sentinel "label" for label-less variables: backed by the union of
    * every node table projected to `(__label, __pk)` — enough for
    * `label(n)`, `id(n)`, `count(n)` and any-rel hops, which is the
    * surface the reference's label-less queries use
    * (metrics_service.py:262). Property access needs a real label. */
  val AnyLabel = "*"

  /** Label-less `MATCH (v)` — union of all node tables, pk + label
    * columns only. Each parquet scan reads just the pk column, so the
    * anchor costs one pruned scan per label, not a full materialize. */
  def matchAnyNode(store: GraphSource, v: String): PatternQuery = {
    val df = store.schema.nodes.map { n =>
      store.node(n.name).select(
        lit(n.name).as(s"${v}____label"),
        col(n.primaryKey).cast("string").as(s"${v}____pk"))
    }.reduce(_ unionByName _)
    new PatternQuery(store, df, Map(v -> AnyLabel), Set(v))
  }

  /** Anchor directly on the union of all relationship tables —
    * the `MATCH ()-[r]->()` metrics shape (metrics_service.py:274)
    * where BOTH endpoints are anonymous and unused. Skips the two
    * node-table joins entirely: graph stores enforce endpoint
    * integrity at COPY time (GraphStore ingest conforms to the schema),
    * so an existence join against the node union adds scans without
    * changing the result. Each branch reads only its rel table's
    * src/dst columns plus literal tags. */
  def matchAnyRelOnly(store: GraphSource, relVar: String,
      relProps: Option[Set[String]] = Some(Set.empty)): PatternQuery = {
    val propCols = sparseRelPropCols(store.schema.rels.toSeq, relVar, relProps)
    val df = store.schema.rels.map { r =>
      // near/far naming matches unionHop so rel-var expressions
      // (`r IS NULL` resolves through `__near`) work on both shapes
      store.rel(r.name).select(
        lit(r.name).as(s"${relVar}__rel_type") +:
          col("src").cast("string").as(s"${relVar}__near") +:
          col("dst").cast("string").as(s"${relVar}__far") +:
          propCols(r): _*)
    }.reduce(_ unionByName _)
    new PatternQuery(store, df, Map.empty, Set(relVar))
  }

  /** Sparse supertype projection of relationship properties across the
    * candidate types of a union hop / any-rel scan: each requested
    * property (`relProps`; `None` = every property any candidate
    * declares) becomes one `relVar__prop` column per branch — the
    * type's own column where declared, typed null where not. When
    * candidate types declare the same property name with DIFFERENT
    * types the shared column widens to string (the only lossless
    * common representation; Cypher's dynamic typing has no narrower
    * union). A property no candidate declares is a loud error — the
    * query references something that cannot exist. */
  private[query] def sparseRelPropCols(
      cands: Seq[RelDef], relVar: String,
      relProps: Option[Set[String]]): RelDef => Seq[Column] = {
    val names = relProps match {
      case None => cands.flatMap(_.properties.map(_.name)).distinct.sorted
      case Some(ps) => ps.toSeq.sorted
    }
    // the union branches already emit synthetic `relVar__<tag>` columns;
    // a property with a tag's name would produce a duplicate column and
    // an AMBIGUOUS_REFERENCE at resolution — fail at compile instead
    val reserved = Set("rel_type", "near", "far", "near_label")
    names.find(reserved.contains).foreach { p =>
      throw new IllegalArgumentException(
        s"relationship property name $p collides with the union-hop tag " +
          s"columns (${reserved.mkString(", ")}) — rename the property")
    }
    val typed = names.map { p =>
      val ts = cands.flatMap(_.properties.find(_.name == p)).map(_.tpe.spark).distinct
      require(ts.nonEmpty,
        s"relationship property $p exists on none of the candidate types " +
          cands.map(_.name).mkString("[", ", ", "]"))
      (p, if (ts.size == 1) ts.head else org.apache.spark.sql.types.StringType)
    }
    r => typed.map { case (p, t) =>
      if (r.properties.exists(_.name == p)) col(p).cast(t).as(s"${relVar}__$p")
      else lit(null).cast(t).as(s"${relVar}__$p")
    }
  }

  /** Anchor on ONE typed relationship table — the
    * `MATCH ()-[r:T]->()` template shape (per-type counts) — with no
    * node joins: graph-store ingest conforms endpoints, so the node
    * scans would add cost without changing the count. Columns are
    * `rv__src`/`rv__dst` (+ rel props), matching a typed hop's rel
    * namespace. */
  def matchRelOnly(store: GraphSource, relVar: String, relType: String): PatternQuery = {
    val df = store.rel(relType)
    new PatternQuery(store,
      df.select(df.columns.map(c => col(c).as(s"${relVar}__$c")).toIndexedSeq: _*),
      Map.empty, Set(relVar))
  }

  /** Re-open a CLOSED pipeline frame (a WITH stage's output, columns
    * already `var__prop`-namespaced for carried node vars) as a pattern
    * segment, so MATCH after WITH can keep joining — openCypher's
    * post-barrier scope. `bound` must include every alias name in the
    * frame so rebinding collisions fail loudly. */
  def fromFrame(store: GraphSource, frame: DataFrame,
      nodeVars: Map[String, String], bound: Set[String]): PatternQuery =
    new PatternQuery(store, frame, nodeVars, bound ++ nodeVars.keySet)

  /** MATCH (v:label) — anchor of a pattern. */
  def matchNode(store: GraphSource, v: String, label: String): PatternQuery = {
    val df = store.node(label)
    new PatternQuery(store,
      df.select(df.columns.map(c => col(c).as(s"${v}__$c")).toIndexedSeq: _*),
      Map(v -> label), Set(v))
  }

  /** Property accessor: p("e.name") → col("e__name"). */
  def p(ref: String): Column = {
    val parts = ref.split("\\.", 2)
    require(parts.length == 2, s"property ref must be var.prop, got $ref")
    col(s"${parts(0)}__${parts(1)}")
  }

  private val aggFunctionNames = Set(
    "sum", "avg", "mean", "min", "max", "count", "count_distinct",
    "collect_list", "collect_set", "first", "last", "stddev",
    "stddev_samp", "variance", "var_samp", "approx_count_distinct",
    "percentile_approx", "median")

  /** Cypher-compiler aggregate detection: walk the (unresolved)
    * expression tree for aggregate functions — the same syntactic rule
    * Cypher uses to split RETURN items into keys vs aggregates. */
  def isAggregate(c: Column): Boolean = {
    val e = ColumnInternals.expression(c)
    e.exists {
      case f: UnresolvedFunction =>
        aggFunctionNames.contains(f.nameParts.last.toLowerCase)
      case _: AggregateExpression => true
      case _ => false
    }
  }
}
