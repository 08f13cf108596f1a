package graft.query.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.query.PatternQuery
import graft.storage.GraphSource
import CypherAst._

/** Compiles the parsed Cypher subset onto [[PatternQuery]] /
  * DataFrame relational algebra — the "our compiler" box in SURVEY.md
  * §3.1's lifecycle. Semantics encoded here (the hard parts list,
  * SURVEY.md §7):
  *
  *  - pattern hops → equi-joins (PatternQuery);
  *  - OPTIONAL MATCH → left joins; `x IS NULL` on an optional var
  *    works because the var's columns are genuinely null;
  *  - implicit grouping at WITH/RETURN — any item containing an
  *    aggregate function makes all non-aggregate items grouping keys;
  *  - a bare node variable carried through WITH keeps all its columns
  *    (grouping by node identity = grouping by its column tuple);
  *  - MATCH after WITH opens a NEW pattern segment — openCypher scope:
  *    only the WITH items survive the barrier, so fresh pattern vars
  *    (even names reused from before the WITH) anchor new scans and
  *    combine with the carried frame as a cross join; Catalyst folds
  *    the cross join + any correlated equality filter into a hash join
  *    (save_view.py's count-then-rematch statement);
  *  - `EXISTS((v)-[:R]->())` / NOT EXISTS → left-semi / left-anti join
  *    on the relationship table (facts_tool.py's dimension filter);
  *  - `substring` is 1-based (the reference's Kuzu-style engine uses
  *    SQL semantics; accounting_demo relies on it);
  *  - `$param` placeholders bound from a Scala map (including
  *    `LIMIT $n` / `SKIP $n`);
  *  - ORDER BY may reference RETURN aliases or pre-projection
  *    expressions (resolved AST-equal items map to their alias).
  *
  * Write clauses (SET/REMOVE/DELETE/CREATE) are not compiled here —
  * [[CypherWriter]] executes them against a writable store; `run` on a
  * write statement throws with that pointer.
  */
final class CypherCompiler(
    source: GraphSource,
    params: Map[String, Any] = Map.empty) {

  private val aggNames = Set("count", "sum", "avg", "min", "max",
    "collect", "stdev", "stdevp", "percentilecont", "percentiledisc")

  def run(text: String): DataFrame =
    CypherParser.parseQuery(text) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(u) => runUnion(u)
    }

  /** Parse and execute a top-level STATEMENT: a read query returns
    * Some(result frame); `COPY (<query>) TO '<path>'` (the reference
    * engine's bulk-export dialect, backup_manager.py) executes the
    * export — distributed CSV part files under `path`, header per the
    * statement's option — and returns None. */
  def runStatement(text: String): Option[DataFrame] =
    CypherParser.parseStatement(text) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(c: CopyTo) =>
        runUnion(c.query).write.mode("overwrite")
          .option("header", c.header).csv(c.path)
        None
      case Right(u: UnionQuery) => Some(runUnion(u))
    }

  private def runUnion(parsed: UnionQuery): DataFrame =
    parsed match {
      case UnionQuery(branches, _) if branches.exists(_.writes.nonEmpty) =>
        throw new IllegalArgumentException(
          "write clauses (SET/REMOVE/DELETE/CREATE) execute via CypherWriter " +
            "against a writable GraphStore, not the read-only compiler")
      case UnionQuery(Seq(q), _) => compile(q)
      case UnionQuery(branches, distinct) =>
        // §2.7: UNION [ALL] of branch results by column name. Trailing
        // ORDER BY/SKIP/LIMIT parse into the LAST branch but apply to
        // the whole union in Cypher — lift them (they may only
        // reference result-column aliases at that point).
        require(branches.init.forall(b =>
          b.orderBy.isEmpty && b.skip.isEmpty && b.limit.isEmpty),
          "ORDER BY/SKIP/LIMIT inside a non-final UNION branch is not supported")
        val last = branches.last
        val trimmedLast = last.copy(orderBy = Seq.empty, skip = None, limit = None)
        val frames = (branches.init :+ trimmedLast).map(compile)
        val unioned = frames.reduce(_ unionByName _)
        val deduped = if (distinct) unioned.distinct() else unioned
        val sorted =
          if (last.orderBy.isEmpty) deduped
          else deduped.orderBy(last.orderBy.map { o =>
            o.expr match {
              case VarRef(a) if deduped.columns.contains(a) =>
                if (o.desc) bcol(a).desc else bcol(a).asc
              case other => throw new IllegalArgumentException(
                s"ORDER BY after UNION may reference result aliases only, got $other")
            }
          }: _*)
        val skipped = last.skip.fold(sorted)(e => sorted.offset(limitValue(e, "SKIP")))
        last.limit.fold(skipped)(e => skipped.limit(limitValue(e, "LIMIT")))
    }

  /** SKIP/LIMIT operand for CypherWriter's RETURN paging. */
  private[cypher] def limitValueOf(e: Expr, what: String): Int = limitValue(e, what)

  /** SKIP/LIMIT operand: integer literal or integral `$param`. */
  private def limitValue(e: Expr, what: String): Int = e match {
    case Lit(n: Long) => n.toInt
    case Param(n) => params.getOrElse(n,
      throw new IllegalArgumentException(s"missing parameter $$$n")) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what parameter $$$n must be integral, got $other")
    }
    case other =>
      throw new IllegalArgumentException(s"$what needs an integer or $$param, got $other")
  }

  // ---- pattern assembly --------------------------------------------------

  private var anonCounter = 0
  private def fresh(prefix: String): String = {
    anonCounter += 1; s"__${prefix}_$anonCounter"
  }

  /** relationship variable → declared type (for `type(r)`). */
  private val relVarTypes = scala.collection.mutable.Map.empty[String, String]

  /** rel variables bound by union hops (untyped `-[r]->`): `type(r)`
    * reads the branch-tagged `r__rel_type` column, not a literal. */
  private val untypedRelVars = scala.collection.mutable.Set.empty[String]

  /** Primary-key column for a node var — label-less vars carry the
    * synthetic `__pk` (see [[PatternQuery.AnyLabel]]). */
  private def pkColName(v: String, vars: Map[String, String]): String =
    if (vars(v) == PatternQuery.AnyLabel) s"${v}____pk"
    else s"${v}__${source.schema.node(vars(v)).primaryKey}"

  /** Query-wide property usage per variable, driving far-node join
    * elision (PatternQuery.hopRight): `None` = the var is carried whole
    * somewhere (bare VarRef in a projection or general expression) so
    * every column is needed; `Some(props)` = only those properties are
    * touched. Key-only accessors — count(v), id(v), v IS [NOT] NULL —
    * and statically-answered ones — label(s)(v), keys(v), type(r) —
    * reference no property column at all. */
  private final class PropUsage {
    private val props = scala.collection.mutable.Map.empty[String, Set[String]]
    private val whole = scala.collection.mutable.Set.empty[String]
    def addProp(v: String, p: String): Unit =
      props.update(v, props.getOrElse(v, Set.empty) + p)
    def addWhole(v: String): Unit = { whole += v; () }
    def propsFor(v: String): Option[Set[String]] =
      if (whole.contains(v)) None else Some(props.getOrElse(v, Set.empty))
  }

  private def walkUsage(e: Expr, u: PropUsage): Unit = e match {
    case Prop(v, p) => u.addProp(v, p)
    case VarRef(v) => u.addWhole(v)
    case FnCall(n, Seq(VarRef(_)), _)
        if Set("count", "id", "label", "labels", "keys", "type").contains(n) => ()
    case FnCall(_, args, _) => args.foreach(walkUsage(_, u))
    case IsNull(VarRef(_), _) => ()
    case IsNull(x, _) => walkUsage(x, u)
    case Bin(_, l, r) => walkUsage(l, u); walkUsage(r, u)
    case Not(x) => walkUsage(x, u)
    case In(x, l) => walkUsage(x, u); walkUsage(l, u)
    case Subscript(x, i) => walkUsage(x, u); walkUsage(i, u)
    case ListLit(items) => items.foreach(walkUsage(_, u))
    case MapLit(items) => items.foreach { case (_, v) => walkUsage(v, u) }
    case CaseWhen(whens, o) =>
      whens.foreach { case (c, v) => walkUsage(c, u); walkUsage(v, u) }
      o.foreach(walkUsage(_, u))
    case ExistsPat(_) => () // key-only: compiles to a semi join on keys
    case _ => ()
  }

  private def analyzeUsage(q: Query): PropUsage = {
    val u = new PropUsage
    def walkNode(n: NodePat): Unit = n.props.foreach { case (k, ve) =>
      n.variable.foreach(u.addProp(_, k)); walkUsage(ve, u)
    }
    def walkPath(p: PathPat): Unit = {
      walkNode(p.head)
      p.hops.foreach { case (_, n) => walkNode(n) }
    }
    q.clauses.foreach {
      case m: MatchClause =>
        m.paths.foreach(walkPath)
        m.where.foreach(walkUsage(_, u))
      case w: WithClause =>
        w.items.foreach(i => walkUsage(i.expr, u))
        w.where.foreach(walkUsage(_, u))
      case UnwindClause(e, _) => walkUsage(e, u)
    }
    q.writes.foreach {
      case SetClause(items, merges) =>
        items.foreach { case (p, e) =>
          u.addWhole(p.variable); walkUsage(e, u)
        }
        merges.foreach { case (v, e) => u.addWhole(v); walkUsage(e, u) }
      case RemoveClause(ts) => ts.foreach(p => u.addWhole(p.variable))
      case DeleteClause(vs, _) => vs.foreach(u.addWhole)
      case CreateClause(paths) => paths.foreach(walkPath)
      case MergeClause(path) => walkPath(path)
    }
    q.ret.foreach(_.items.foreach(i => walkUsage(i.expr, u)))
    q.orderBy.foreach(o => walkUsage(o.expr, u))
    u
  }

  def compile(q: Query): DataFrame = {
    require(q.writes.isEmpty,
      "write clauses execute via CypherWriter, not the read-only compiler")
    val ret = q.ret.getOrElse(
      throw new IllegalArgumentException("read query needs a RETURN clause"))
    val (frame, vars) = compileReads(q)
    val (out, _) = project(frame, vars, ret.items, ret.distinct, q.orderBy,
      keepNamespaces = false)
    var res = out
    q.skip.foreach(e => res = res.offset(limitValue(e, "SKIP")))
    q.limit.foreach(e => res = res.limit(limitValue(e, "LIMIT")))
    res
  }

  /** Runs the reading clauses left to right and returns the final
    * (frame, node-var → label) state — shared by `compile` (RETURN) and
    * [[CypherWriter]] (write clauses evaluate against this frame). */
  private[cypher] def compileReads(q: Query): (DataFrame, Map[String, String]) = {
    // per-single-query state: a UNION's branches (and repeated run()
    // calls) must not see a sibling's rel vars
    relVarTypes.clear()
    untypedRelVars.clear()
    val usage = analyzeUsage(q)

    // The pipeline alternates between an OPEN pattern segment (pq:
    // joins accumulate) and a CLOSED frame (after WITH/UNWIND). A MATCH
    // on a closed frame re-opens it as a segment (carried node vars
    // stay joinable); fresh anchors inside a segment cross join.
    var pq: PatternQuery = null
    var frame: DataFrame = null
    var vars = Map.empty[String, String]   // vars in the closed frame
    var bound = Set.empty[String]          // all names in the closed frame
    var deferred = Vector.empty[Expr]      // filters applied at segment close

    def closeSegment(): Unit = {
      if (pq != null) {
        vars = vars ++ pq.variables
        frame = pq.df
        bound = bound ++ pq.variables.keySet
        pq = null
      }
      if (deferred.nonEmpty) {
        require(frame != null, "dangling filters without a frame")
        deferred.foreach(d => frame = frame.filter(toColumn(d, vars)))
        deferred = Vector.empty
      }
    }

    def reopenSegment(): Unit = {
      if (pq == null && frame != null) {
        pq = PatternQuery.fromFrame(source, frame, vars, bound)
        frame = null; vars = Map.empty; bound = Set.empty
      }
    }

    q.clauses.foreach {
      case m: MatchClause if m.optional =>
        require(m.paths.length == 1, "OPTIONAL MATCH supports one path per clause")
        reopenSegment()
        pq = compileOptionalPath(pq, m.paths.head, m.where, usage)

      case m: MatchClause =>
        reopenSegment()
        m.paths.foreach { path =>
          pq = compilePath(pq, path, (c: Expr) => deferred :+= c, usage)
        }
        m.where.foreach { w =>
          // EXISTS pattern predicates peel off as semi/anti joins; the
          // residue (and anything referencing closed-frame aliases)
          // filters the frame at segment close
          val (existsParts, residue) = splitExists(w)
          existsParts.foreach { case (path, negated) =>
            pq = applyExists(pq, path, negated, usage)
          }
          residue.foreach { r =>
            if (referencedVars(r).subsetOf(pq.variables.keySet ++ relVarTypes.keySet ++
                untypedRelVars))
              pq = pq.where(toColumn(r, pq.variables))
            else deferred :+= r
          }
        }

      case w: WithClause =>
        closeSegment()
        require(frame != null, "WITH needs a preceding MATCH/UNWIND")
        val (f2, v2) = project(frame, vars, w.items, distinct = false,
          sortBy = Seq.empty, keepNamespaces = true)
        frame = f2; vars = v2
        // a WITH output alias shadows any rel var of the same name — the
        // rel's columns are gone from the frame, so the registries must
        // forget it or count(x)/type(x) would reference dropped columns
        val outNames = w.items.map(i => i.alias.getOrElse(pretty(i.expr)))
        outNames.foreach { n => relVarTypes.remove(n); untypedRelVars.remove(n) }
        bound = vars.keySet ++ outNames
        w.where.foreach { cond => frame = frame.filter(toColumn(cond, vars)) }

      case UnwindClause(e, v) =>
        closeSegment()
        // MATCH-less UNWIND queries anchor on a one-row frame
        if (frame == null) {
          frame = org.apache.spark.sql.SparkSession.active.range(1).drop("id")
        }
        // UNWIND list AS x — explode; empty/null lists yield no rows
        // (openCypher semantics, which is exactly explode's)
        require(!vars.contains(v) && !frame.columns.contains(v),
          s"UNWIND rebinds $v")
        frame = frame.withColumn(v, explode(toColumn(e, vars)))
        bound = bound + v
    }
    closeSegment()
    require(frame != null, "query needs at least one MATCH or UNWIND clause")
    (frame, vars)
  }

  /** Split a WHERE into (EXISTS-pattern conjuncts, residual conjuncts).
    * EXISTS under anything but a top-level [NOT] conjunct is rejected
    * in toColumn with guidance. */
  private def splitExists(e: Expr): (Seq[(PathPat, Boolean)], Option[Expr]) = {
    def conjuncts(x: Expr): Seq[Expr] = x match {
      case Bin("AND", l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val parts = conjuncts(e)
    val exists = parts.collect {
      case ExistsPat(p) => (p, false)
      case Not(ExistsPat(p)) => (p, true)
    }
    val residue = parts.filter {
      case ExistsPat(_) | Not(ExistsPat(_)) => false
      case _ => true
    }
    (exists, residue.reduceOption((a, b) => Bin("AND", a, b)))
  }

  /** `[NOT] EXISTS((v)-[:R]->(far))` → left-semi/anti join. The bound
    * endpoint may be on either side; the far endpoint must be
    * anonymous or schema-consistent and property-free (the reference's
    * only emitted shape, facts_tool.py). */
  private def applyExists(
      pq: PatternQuery, path: PathPat, negated: Boolean,
      usage: PropUsage): PatternQuery = {
    require(pq != null, "EXISTS needs a preceding MATCH")
    require(path.hops.length == 1,
      "EXISTS pattern predicates support a single hop")
    val (rel, far) = path.hops.head
    require(!rel.undirected && rel.varLength.isEmpty,
      "EXISTS pattern predicates are typed, directed, single hops")
    val relType = rel.relType.getOrElse(throw new IllegalArgumentException(
      "EXISTS pattern predicates need a relationship type"))
    require(far.props.isEmpty && path.head.props.isEmpty,
      "property maps inside EXISTS patterns are not supported — " +
        "rewrite as a separate MATCH + WHERE")
    val headVar = path.head.variable
    val farVar = far.variable
    def bound(v: Option[String]) = v.filter(pq.variables.contains)
    // the bound endpoint anchors the join; if BOTH endpoints are bound
    // the far side joins too (the predicate tests the specific pair,
    // not "anchor has any such relationship")
    val (anchor, forward, farAnchor, anchorIsHead) =
      (bound(headVar), bound(farVar)) match {
        case (Some(h), f) => (h, rel.rightward, f, true)
        case (None, Some(f)) => (f, !rel.rightward, None, false)
        case _ => throw new IllegalArgumentException(
          "EXISTS pattern needs one endpoint bound by the enclosing MATCH")
      }
    // schema validation of the declared labels (loud, not silent-empty)
    val d = source.schema.rel(relType)
    val (nearL, farL) = if (forward) (d.from, d.to) else (d.to, d.from)
    require(pq.variables(anchor) == PatternQuery.AnyLabel ||
      pq.variables(anchor) == nearL,
      s"EXISTS endpoint $anchor:${pq.variables(anchor)} does not match " +
        s"$relType's ${if (forward) "source" else "target"} label $nearL")
    // the far endpoint is whichever pattern node is NOT the anchor —
    // selecting by arrow orientation instead would validate the anchor
    // against the far schema label on leftward patterns (falsely
    // rejecting valid queries) and never check the real far node
    val farPat = if (anchorIsHead) path.hops.head._2 else path.head
    farPat.label.foreach(l => require(l == farL,
      s"EXISTS far label $l does not match schema endpoint $farL"))
    farAnchor.foreach { f =>
      require(pq.variables(f) == PatternQuery.AnyLabel ||
        pq.variables(f) == farL,
        s"EXISTS endpoint $f:${pq.variables(f)} does not match " +
          s"$relType's ${if (forward) "target" else "source"} label $farL")
    }
    pq.existsHop(relType, anchor, forward, negated, farAnchor)
  }

  /** Variables an expression references (exposed for CypherWriter's
    * RETURN resolution of CREATE/MERGE-bound vars). */
  private[cypher] def referencedVarsOf(e: Expr): Set[String] = referencedVars(e)

  private def referencedVars(e: Expr): Set[String] = e match {
    case Prop(v, _) => Set(v)
    case VarRef(v) => Set(v)
    case Bin(_, l, r) => referencedVars(l) ++ referencedVars(r)
    case Not(x) => referencedVars(x)
    case IsNull(x, _) => referencedVars(x)
    case In(x, l) => referencedVars(x) ++ referencedVars(l)
    case Subscript(x, i) => referencedVars(x) ++ referencedVars(i)
    case FnCall(_, args, _) => args.flatMap(referencedVars).toSet
    case ListLit(items) => items.flatMap(referencedVars).toSet
    case MapLit(items) => items.flatMap { case (_, v) => referencedVars(v) }.toSet
    case CaseWhen(whens, o) =>
      whens.flatMap { case (c, v) => referencedVars(c) ++ referencedVars(v) }.toSet ++
        o.toSeq.flatMap(referencedVars)
    case ExistsPat(p) =>
      (p.head.variable ++ p.hops.flatMap { case (r, n) => r.variable ++ n.variable }).toSet
    case _ => Set.empty
  }

  /** OPTIONAL MATCH: whole-path left join via PatternQuery.optionalPath
    * — the clause's WHERE and inline property maps filter the subtree
    * BEFORE the left join (post-join filtering would drop unmatched
    * left rows, violating Cypher's left-preservation). The predicate
    * may reference only the path's newly-bound variables. */
  /** Far-node property demand for a hop's target node: an anonymous
    * node is only reachable through its inline property map; a named
    * one adds every query-wide reference. */
  private def farPropsFor(node: NodePat, usage: PropUsage): Option[Set[String]] = {
    val inline = node.props.map(_._1).toSet
    node.variable match {
      case None => Some(inline)
      case Some(v) => usage.propsFor(v).map(_ ++ inline)
    }
  }

  private def compileOptionalPath(
      start: PatternQuery, path: PathPat, where: Option[Expr],
      usage: PropUsage): PatternQuery = {
    require(start != null, "OPTIONAL MATCH cannot be the first clause")
    val headVar = path.head.variable.getOrElse(
      throw new IllegalArgumentException("OPTIONAL MATCH path needs a bound head variable"))
    require(start.variables.contains(headVar),
      s"OPTIONAL MATCH head $headVar must already be bound")
    require(path.head.props.isEmpty,
      "property map on the bound head of an OPTIONAL MATCH is not supported")
    var fromLabel = start.variables(headVar)
    // pair each hop with its ASSIGNED node variable so inline property
    // maps on anonymous nodes still filter (a node.variable-keyed
    // lookup would silently drop them)
    val hopFarProps = scala.collection.mutable.Map.empty[String, Option[Set[String]]]
    val hopSpecsWithProps = path.hops.map { case (rel, node) =>
      require(!rel.undirected,
        "undirected relationship patterns (a)-[:R]-(b) are not supported " +
          "in OPTIONAL MATCH — write the direction explicitly")
      val relType = rel.relType.getOrElse(
        throw new IllegalArgumentException(
          "untyped relationships are not supported in OPTIONAL MATCH"))
      require(rel.varLength.isEmpty, "variable-length OPTIONAL MATCH is not supported")
      val toVar = node.variable.getOrElse(fresh("n"))
      require(!start.variables.contains(toVar),
        s"cyclic OPTIONAL MATCH (rebinding $toVar) is not supported")
      val rv = rel.variable.getOrElse(fresh("r"))
      relVarTypes.update(rv, relType)
      hopFarProps.update(toVar, farPropsFor(node, usage))
      fromLabel = if (rel.rightward) source.schema.rel(relType).to
                  else source.schema.rel(relType).from
      ((relType, rv, toVar, rel.rightward, fromLabel), node.props.map {
        case (k, ve) => Bin("=", Prop(toVar, k), ve): Expr
      })
    }
    val hopSpecs = hopSpecsWithProps.map(_._1)
    val newVars = hopSpecs.map(_._3).toSet ++ hopSpecs.map(_._2).toSet
    val newVarLabels = hopSpecs.map(sp => sp._3 -> sp._5).toMap
    val propFilters = hopSpecsWithProps.flatMap(_._2)
    val allFilters = propFilters ++ where.toSeq
    allFilters.foreach { f =>
      val refs = referencedVars(f)
      require(refs.subsetOf(newVars),
        s"OPTIONAL MATCH WHERE may reference only the optional path's own " +
          s"variables ($newVars); got $refs — move outer-variable predicates " +
          "to a WITH/WHERE after the clause")
    }
    val varsForExpr = start.variables ++ newVarLabels
    val filterCol = allFilters
      .map(toColumn(_, varsForExpr))
      .reduceOption(_ && _)
    start.optionalPath(headVar, hopSpecs.map(sp => (sp._1, sp._2, sp._3, sp._4)),
      filterCol, v => hopFarProps.getOrElse(v, None))
  }

  private def compilePath(
      start: PatternQuery, path: PathPat,
      addFilter: Expr => Unit, usage: PropUsage): PatternQuery = {
    // `MATCH ()-[r]->()` with both endpoints anonymous and unused —
    // the metrics rel-scan shape (metrics_service.py:274) — anchors on
    // the rel-table union alone; the node joins would add a scan per
    // label without changing the result (ingest enforces endpoints)
    path match {
      // Join-free rel scans are an ELISION of the endpoint joins, so
      // they are gated on declared FK integrity like every other
      // elision: on a store that can hold dangling endpoints the node
      // joins are load-bearing filters, and the pattern falls through
      // to the anchored compile below.
      case PathPat(NodePat(None, None, Seq()),
          Seq((rel, NodePat(None, None, Seq()))))
          if start == null && !rel.undirected && rel.varLength.isEmpty &&
            source.referentialIntegrity =>
        val rv = rel.variable.getOrElse(fresh("r"))
        rel.relType match {
          case None =>
            untypedRelVars += rv
            return PatternQuery.matchAnyRelOnly(source, rv, usage.propsFor(rv))
          case Some(t) =>
            // typed rel-scan `()-[r:T]->()` (data_tools.py's per-type
            // count template): one rel-table scan, no node anchors
            relVarTypes.update(rv, t)
            return PatternQuery.matchRelOnly(source, rv, t)
        }
      case _ => ()
    }
    val headVar = path.head.variable.getOrElse(fresh("n"))
    var pq = start match {
      case null =>
        path.head.label match {
          case Some(label) => PatternQuery.matchNode(source, headVar, label)
          case None =>
            // label-less MATCH (n): union of node tables, pk+label only
            // (metrics_service.py:262)
            require(path.head.props.isEmpty,
              "property map on a label-less node is not supported — add a label")
            PatternQuery.matchAnyNode(source, headVar)
        }
      case prev if prev.variables.contains(headVar) => prev
      case prev =>
        val label = path.head.label.getOrElse(
          throw new IllegalArgumentException(s"new node $headVar needs a label"))
        prev.alsoMatch(headVar, label)
    }
    path.head.props.foreach { case (k, v) =>
      addFilter(Bin("=", Prop(headVar, k), v))
    }
    var fromVar = headVar
    path.hops.foreach { case (rel, node) =>
      require(rel.props.isEmpty,
        "relationship property maps are write-only syntax (CREATE); " +
          "filter rel properties with WHERE r.prop = …")
      // Untyped and/or undirected relationships compile via the
      // union-of-branches hop (financial.py:411-412,
      // metrics_service.py:274); typed+directed hops keep the single
      // rel-table fast path below.
      if (rel.relType.isEmpty || rel.undirected) {
        val toVar = node.variable.getOrElse(fresh("n"))
        require(!pq.variables.contains(toVar),
          s"cyclic union-hop patterns (rebinding $toVar) are not supported")
        require(node.props.isEmpty || node.label.nonEmpty,
          "property map on a label-less node is not supported — add a label")
        rel.varLength match {
          case Some((lo, hi)) =>
            // heterogeneous bounded path -[*min..max]-> : reachability
            // over the label-tagged union edge set
            require(rel.relType.isEmpty && !rel.undirected,
              "variable-length hops are -[*min..max]-> (any type, directed) " +
                "or single typed hops — typed/undirected var-length is not supported")
            pq = pq.outVarAny(fromVar, toVar, lo, hi, rel.rightward, node.label)
          case None =>
            val rv = rel.variable.getOrElse(fresh("r"))
            rel.relType match {
              case Some(t) => relVarTypes.update(rv, t)
              case None => untypedRelVars += rv
            }
            val (dirOut, dirIn) =
              if (rel.undirected) (true, true)
              else if (rel.rightward) (true, false) else (false, true)
            pq = pq.unionHop(fromVar, toVar, rv, rel.relType.map(Seq(_)),
              dirOut, dirIn, node.label, farPropsFor(node, usage),
              usage.propsFor(rv))
        }
        node.props.foreach { case (k, v) => addFilter(Bin("=", Prop(toVar, k), v)) }
        fromVar = toVar
      } else compileTypedHop(pq, rel, node, fromVar, addFilter, usage) match {
        case (pq2, toVar) => pq = pq2; fromVar = toVar
      }
    }
    pq
  }

  private def compileTypedHop(
      pq0: PatternQuery, rel: RelPat, node: NodePat, fromVar: String,
      addFilter: Expr => Unit, usage: PropUsage): (PatternQuery, String) = {
    val relType = rel.relType.get
    val toVar = node.variable.getOrElse(fresh("n"))
    val rv = rel.variable.getOrElse(fresh("r"))
    relVarTypes.update(rv, relType)
    val pq =
      if (pq0.variables.contains(toVar)) {
        // cycle closure: both endpoints bound — join the rel table only
        require(rel.varLength.isEmpty,
          s"cyclic pattern on $toVar supports plain inner hops only")
        val (src, dst) = if (rel.rightward) (fromVar, toVar) else (toVar, fromVar)
        pq0.closeHop(relType, src, dst, rv)
      } else rel.varLength match {
        case Some((lo, hi)) => pq0.outVar(relType, fromVar, toVar, lo, hi, rel.rightward)
        case None =>
          val fp = farPropsFor(node, usage)
          if (rel.rightward) pq0.out(relType, fromVar, toVar, optional = false, rv, fp)
          else pq0.in(relType, fromVar, toVar, optional = false, rv, fp)
      }
    node.label.foreach { l =>
      val declared = pq.variables(toVar)
      require(declared == l,
        s"pattern label $l does not match schema endpoint $declared for $toVar")
    }
    node.props.foreach { case (k, v) => addFilter(Bin("=", Prop(toVar, k), v)) }
    (pq, toVar)
  }

  // ---- projection with implicit grouping ---------------------------------

  /** Column accessor safe for alias names containing dots (`e.name`). */
  private def bcol(name: String): Column = col(s"`$name`")


  /** Expand items: a bare node variable keeps its full column set. */
  private def expandItems(
      items: Seq[ProjectionItem], vars: Map[String, String],
      frame: DataFrame, keepNamespaces: Boolean): Seq[(String, Column, Option[Expr])] =
    items.flatMap {
      case ProjectionItem(VarRef(v), alias) if vars.contains(v) =>
        val prefix = s"${v}__"
        val out = alias.getOrElse(v)
        val cols = frame.columns.filter(_.startsWith(prefix))
        if (keepNamespaces)
          // `WITH v AS w` renames the whole namespace so later
          // references to w.prop (and the carried-var registry) resolve
          cols.map(c => (s"${out}__${c.stripPrefix(prefix)}", col(c), None))
        else cols.map { c =>
          val propName = c.stripPrefix(prefix)
          // record the Prop AST so ORDER BY v.prop post-aggregation
          // resolves to the expanded column
          (s"$out.$propName", col(c), Some(Prop(v, propName): Expr))
        }
      case ProjectionItem(PropStar(v), _) =>
        // `v.*` (the COPY/export convention): every property column of
        // v under its BARE property name — works for node vars and rel
        // vars alike (both namespaces are `v__prop` in the frame)
        val prefix = s"${v}__"
        val cols = frame.columns.filter(_.startsWith(prefix))
        require(cols.nonEmpty, s"$v.* matches no columns of $v")
        cols.map(c => (c.stripPrefix(prefix), col(c), None))
      case ProjectionItem(e, alias) =>
        Seq((alias.getOrElse(pretty(e)), toColumn(e, vars), Some(e)))
    }

  private def isAggExpr(e: Expr): Boolean = e match {
    case FnCall(n, args, _) =>
      aggNames.contains(n) || args.exists(isAggExpr)
    case Bin(_, l, r) => isAggExpr(l) || isAggExpr(r)
    case Not(x) => isAggExpr(x)
    case IsNull(x, _) => isAggExpr(x)
    case In(x, l) => isAggExpr(x) || isAggExpr(l)
    case Subscript(x, i) => isAggExpr(x) || isAggExpr(i)
    case MapLit(items) => items.exists { case (_, v) => isAggExpr(v) }
    case CaseWhen(whens, o) =>
      whens.exists { case (c, v) => isAggExpr(c) || isAggExpr(v) } ||
        o.exists(isAggExpr)
    case _ => false
  }

  private[cypher] def project(
      frame: DataFrame, vars: Map[String, String],
      items: Seq[ProjectionItem], distinct: Boolean,
      sortBy: Seq[OrderItem], keepNamespaces: Boolean): (DataFrame, Map[String, String]) = {

    val expanded = expandItems(items, vars, frame, keepNamespaces)
    val hasAgg = items.exists {
      case ProjectionItem(e, _) => isAggExpr(e)
    }
    val carriedVars =
      if (keepNamespaces)
        items.collect {
          case ProjectionItem(VarRef(x), alias) if vars.contains(x) =>
            alias.getOrElse(x) -> vars(x)
        }.toMap
      else Map.empty[String, String]

    val projected: DataFrame =
      if (!hasAgg) {
        val f2 = frame.select(expanded.map { case (n, c, _) => c.as(n) }: _*)
        if (distinct) f2.distinct() else f2
      } else {
        val (aggs, keys) = expanded.partition {
          case (_, _, Some(e)) => isAggExpr(e)
          case _ => false
        }
        require(aggs.nonEmpty)
        val grouped =
          if (keys.isEmpty)
            frame.agg(aggs.head._2.as(aggs.head._1),
              aggs.tail.map { case (n, c, _) => c.as(n) }: _*)
          else frame.groupBy(keys.map { case (n, c, _) => c.as(n) }: _*)
            .agg(aggs.head._2.as(aggs.head._1),
              aggs.tail.map { case (n, c, _) => c.as(n) }: _*)
        val ordered = grouped.select(expanded.map { case (n, _, _) => bcol(n) }: _*)
        if (distinct) ordered.distinct() else ordered
      }

    // ORDER BY: alias, AST-equal item alias, or (non-agg case) an
    // expression over the pre-projection frame appended temporarily.
    val sorted =
      if (sortBy.isEmpty) projected
      else {
        val itemByAst: Map[Expr, String] = expanded.collect {
          case (n, _, Some(e)) => (e, n)
        }.toMap
        def sortCol(o: OrderItem): (Column, Boolean) = o.expr match {
          case VarRef(a) if projected.columns.contains(a) => (bcol(a), o.desc)
          case e if itemByAst.contains(e) => (bcol(itemByAst(e)), o.desc)
          case e => (toColumn(e, vars), o.desc) // pre-projection expr
        }
        val resolved = sortBy.map(sortCol)
        val usesPreProjection = sortBy.exists {
          case OrderItem(VarRef(a), _) => !projected.columns.contains(a)
          case OrderItem(e, _) => !itemByAst.contains(e)
        }
        if (!usesPreProjection || hasAgg || distinct)
          projected.orderBy(resolved.map { case (c, d) => if (d) c.desc else c.asc }: _*)
        else {
          // append sort keys, sort, drop — keeps exprs over carried vars legal
          val tmpNames = resolved.indices.map(i => s"__sort_$i")
          val withKeys = frame.select(
            (expanded.map { case (n, c, _) => c.as(n) } ++
              resolved.zip(tmpNames).map { case ((c, _), n) => c.as(n) }): _*)
          withKeys.orderBy(resolved.zip(tmpNames).map { case ((_, d), n) =>
            if (d) col(n).desc else col(n).asc
          }: _*).drop(tmpNames: _*)
        }
      }
    (sorted, carriedVars)
  }

  // ---- expression compilation --------------------------------------------

  private def litColumn(v: Any): Column = v match {
    case null => lit(null)
    case s: Seq[_] => array(s.map(litColumn): _*)
    case other => lit(other)
  }

  private[cypher] def toColumn(e: Expr, vars: Map[String, String]): Column = e match {
    case PropStar(v) => throw new IllegalArgumentException(
      s"$v.* is only valid as a whole projection item (RETURN/WITH)")
    case Prop(v, name) =>
      // backtick-quoted so property names containing dots (newly
      // parseable via backtick identifiers) resolve as literal column
      // names, not struct-field paths
      bcol(s"${v}__$name")
    case VarRef(n) => col(n) // bare alias from a WITH stage
    case Param(n) => litColumn(params.getOrElse(n,
      throw new IllegalArgumentException(s"missing parameter $$$n")))
    case Lit(v) => lit(v)
    case ListLit(items) => array(items.map(toColumn(_, vars)): _*)
    case MapLit(items) =>
      // named struct — keeps key order and per-key types (a Spark map
      // would force one value type); collect({…}) works unchanged
      struct(items.map { case (k, v) => toColumn(v, vars).as(k) }: _*)
    case Star => lit(1)
    case Not(x) => !toColumn(x, vars)
    case IsNull(x, neg) =>
      val c = x match {
        // `n IS NULL` on a node var: test its key column
        case VarRef(v) if vars.contains(v) => col(pkColName(v, vars))
        // `r IS NULL` on a relationship var: test its src/near column
        // (null exactly when the optional hop found no match)
        case VarRef(v) if relVarTypes.contains(v) => col(s"${v}__src")
        case VarRef(v) if untypedRelVars.contains(v) => col(s"${v}__near")
        case other => toColumn(other, vars)
      }
      if (neg) c.isNotNull else c.isNull
    case In(x, ListLit(items)) => toColumn(x, vars).isin(items.map {
      case Lit(v) => v
      case other => throw new IllegalArgumentException(s"IN needs literals, got $other")
    }: _*)
    case In(x, Param(n)) =>
      params.getOrElse(n, throw new IllegalArgumentException(s"missing parameter $$$n")) match {
        case s: Seq[_] => toColumn(x, vars).isin(s: _*)
        case other => toColumn(x, vars) === lit(other)
      }
    case In(x, other) => array_contains(toColumn(other, vars), toColumn(x, vars))
    case Subscript(x, i) =>
      // openCypher subscripts are 0-based, negative = from the end;
      // element_at is 1-based for non-negative and already end-relative
      // for negatives — shift only the non-negative side
      val base = toColumn(x, vars)
      val idx = toColumn(i, vars)
      element_at(base, when(idx >= 0, idx + 1).otherwise(idx).cast("int"))
    case CaseWhen(whens, otherwise) =>
      val base = whens.tail.foldLeft(
        when(toColumn(whens.head._1, vars), toColumn(whens.head._2, vars))) {
        case (acc, (c, v)) => acc.when(toColumn(c, vars), toColumn(v, vars))
      }
      otherwise.fold(base)(o => base.otherwise(toColumn(o, vars)))
    case ExistsPat(_) =>
      throw new IllegalArgumentException(
        "EXISTS pattern predicates are supported as top-level WHERE " +
          "conjuncts only (optionally under NOT) — not nested in OR/CASE")
    case Bin("ILIKE", l, r) =>
      // reference dialect: case-insensitive LIKE with SQL %/_ wildcards
      val pat = r match {
        case Lit(s: String) => s
        case Param(n) => params.getOrElse(n, throw new IllegalArgumentException(
          s"missing parameter $$$n")).toString
        case other => throw new IllegalArgumentException(
          s"ILIKE needs a literal or $$param pattern, got $other")
      }
      toColumn(l, vars).ilike(pat)
    case Bin(op, l, r) =>
      val (lc, rc) = (toColumn(l, vars), toColumn(r, vars))
      op match {
        case "AND" => lc && rc
        case "OR" => lc || rc
        case "=" => lc === rc
        case "<>" => lc =!= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "%" => lc % rc
        case "CONTAINS" => lc.contains(rc)
        case "STARTS" => lc.startsWith(rc)
        case "ENDS" => lc.endsWith(rc)
      }
    case FnCall(name, args, distinct) =>
      compileFn(name, args, distinct, vars)
  }

  private def compileFn(
      name: String, args: Seq[Expr], distinct: Boolean,
      vars: Map[String, String]): Column = {
    def a(i: Int): Column = toColumn(args(i), vars)
    name match {
      // aggregates — count(v) over a node var counts its non-null keys
      case "count" => args match {
        case Seq(Star) => count(lit(1))
        case Seq(VarRef(v)) if vars.contains(v) =>
          val key = col(pkColName(v, vars))
          if (distinct) count_distinct(key) else count(key)
        // count(r) over a relationship var counts its endpoint tuple
        // (metrics_service.py's `RETURN count(r) as count` shapes).
        // Relationship identity in this engine IS the (type, src, dst)
        // triple — ingest dedups rel rows on the endpoint pair
        // (GraphStore.ingestRels), so there are no parallel edges of
        // one type and DISTINCT over the triple equals openCypher's
        // per-relationship identity. Untyped vars add the branch-tag
        // column: per-label keys collide across labels, and the same
        // string pair in two rel types is two relationships.
        case Seq(VarRef(v)) if relVarTypes.contains(v) =>
          if (distinct) count_distinct(col(s"${v}__src"), col(s"${v}__dst"))
          else count(col(s"${v}__src"))
        case Seq(VarRef(v)) if untypedRelVars.contains(v) =>
          if (distinct)
            count_distinct(col(s"${v}__rel_type"), col(s"${v}__near"), col(s"${v}__far"))
          else count(col(s"${v}__near"))
        case Seq(x) =>
          if (distinct) count_distinct(toColumn(x, vars)) else count(toColumn(x, vars))
      }
      case "sum" => if (distinct) sum_distinct(a(0)) else sum(a(0))
      case "avg" =>
        if (distinct) sum_distinct(a(0)) / count_distinct(a(0)) else avg(a(0))
      case "min" | "max" =>
        // min/max are DISTINCT-insensitive
        if (name == "min") min(a(0)) else max(a(0))
      case "collect" =>
        if (distinct) collect_set(a(0)) else collect_list(a(0))
      // Kuzu-style statistical aggregates (facts_tool.py's analysis
      // surface). These were in the aggregate-DETECTION set but not
      // compiled — an accepted-then-thrown gap.
      case "stdev" => stddev_samp(a(0))
      case "stdevp" => stddev_pop(a(0))
      case "percentilecont" => args match {
        case Seq(x, Lit(p)) =>
          percentile(toColumn(x, vars), lit(p match {
            case d: Double => d
            case l: Long => l.toDouble
            case other => throw new IllegalArgumentException(
              s"percentileCont fraction must be numeric, got $other")
          }))
        case _ => throw new IllegalArgumentException(
          "percentileCont(expr, fraction) needs a literal fraction")
      }
      // discrete percentile: the smallest element whose cumulative
      // position reaches the fraction (Kuzu QUANTILE_DISC semantics —
      // returns an actual element, no interpolation). Exact quantiles
      // need the per-group value list; identical collect_list subtrees
      // dedup in PhysicalAggregation, so this is ONE aggregate buffer.
      case "percentiledisc" => args match {
        case Seq(x, Lit(p)) =>
          val frac = p match {
            case d: Double => d
            case l: Long => l.toDouble
            case other => throw new IllegalArgumentException(
              s"percentileDisc fraction must be numeric, got $other")
          }
          require(frac >= 0.0 && frac <= 1.0, "percentileDisc fraction in [0,1]")
          val sorted = sort_array(collect_list(toColumn(x, vars)))
          element_at(sorted,
            greatest(ceil(size(sorted) * lit(frac)).cast("int"), lit(1)))
        case _ => throw new IllegalArgumentException(
          "percentileDisc(expr, fraction) needs a literal fraction")
      }
      // scalar functions from the §2.8 exercised surface
      case "substring" =>
        // The reference engine (Kuzu-style) uses SQL 1-based substring
        // (accounting_demo/05 relies on substring(t.date, 1, 7) =
        // 'YYYY-MM'); clamp 0 to 1 so openCypher-habit queries behave
        if (args.length == 3) substring(a(0), cypherStart(args(1)), lenLit(args(2)))
        else substr(a(0), greatest(a(1), lit(1)))
      case "toupper" | "upper" => upper(a(0))
      case "tolower" | "lower" => lower(a(0))
      case "trim" => trim(a(0))
      case "size" | "length" => args.head match {
        case VarRef(_) | ListLit(_) => size(a(0))
        case _ => length(a(0))
      }
      case "coalesce" => coalesce(args.map(toColumn(_, vars)): _*)
      case "abs" => abs(a(0))
      case "round" => if (args.length == 2) round(a(0), lenLit(args(1))) else round(a(0))
      case "tostring" => a(0).cast("string")
      case "tointeger" => a(0).cast("long")
      case "tofloat" => a(0).cast("double")
      case "date" => to_date(a(0))
      case "split" => split(a(0), argString(args(1)))
      // graph introspection (§2.3 last row)
      case "id" => args.head match {
        case VarRef(v) if vars.contains(v) => col(pkColName(v, vars))
        case _ => throw new IllegalArgumentException("id() needs a node variable")
      }
      case "labels" => args.head match {
        case VarRef(v) if vars.get(v).contains(PatternQuery.AnyLabel) =>
          array(col(s"${v}____label"))
        case VarRef(v) if vars.contains(v) => array(lit(vars(v)))
        case _ => throw new IllegalArgumentException("labels() needs a node variable")
      }
      case "label" => args.head match {
        case VarRef(v) if vars.get(v).contains(PatternQuery.AnyLabel) =>
          col(s"${v}____label")
        case VarRef(v) if vars.contains(v) => lit(vars(v))
        // LABEL(r) on a relationship var is the reference's spelling of
        // type(r) (metrics_service.py:274)
        case VarRef(v) if relVarTypes.contains(v) => lit(relVarTypes(v))
        case VarRef(v) if untypedRelVars.contains(v) => col(s"${v}__rel_type")
        case _ => throw new IllegalArgumentException("label() needs a node or relationship variable")
      }
      case "type" => args.head match {
        case VarRef(v) if relVarTypes.contains(v) => lit(relVarTypes(v))
        case VarRef(v) if untypedRelVars.contains(v) => col(s"${v}__rel_type")
        case _ => throw new IllegalArgumentException("type() needs a relationship variable")
      }
      case "keys" => args.head match {
        case VarRef(v) if vars.get(v).contains(PatternQuery.AnyLabel) =>
          // label-less var: resolve the property list from the label
          // column — a schema-static CASE, no extra scan
          // (routers/graphs/schema/utils.py's discovery query)
          val lbl = col(s"${v}____label")
          val nodes = source.schema.nodes
          nodes.tail.foldLeft(
            when(lbl === nodes.head.name,
              array(nodes.head.properties.map(p => lit(p.name)): _*))) { (acc, n) =>
            acc.when(lbl === n.name, array(n.properties.map(p => lit(p.name)): _*))
          }
        case VarRef(v) if vars.contains(v) =>
          array(source.schema.node(vars(v)).properties.map(p => lit(p.name)): _*)
        case _ => throw new IllegalArgumentException("keys() needs a node variable")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported function: $other")
    }
  }

  private def cypherStart(e: Expr): Int = e match {
    case Lit(n: Long) => math.max(n.toInt, 1)
    case other => throw new IllegalArgumentException(s"substring start must be literal, got $other")
  }
  private def lenLit(e: Expr): Int = e match {
    case Lit(n: Long) => n.toInt
    case other => throw new IllegalArgumentException(s"literal int expected, got $other")
  }
  private def argString(e: Expr): String = e match {
    case Lit(s: String) => s
    case other => throw new IllegalArgumentException(s"string literal expected, got $other")
  }

  private def pretty(e: Expr): String = e match {
    case PropStar(v) => s"$v.*"
    case Prop(v, n) => s"$v.$n"
    case VarRef(n) => n
    case Param(n) => s"$$$n"
    case Lit(s: String) => s"'$s'"
    case Lit(v) => String.valueOf(v)
    case Star => "*"
    case FnCall(n, args, d) =>
      s"$n(${if (d) "DISTINCT " else ""}${args.map(pretty).mkString(", ")})"
    case Bin(op, l, r) => s"${pretty(l)} $op ${pretty(r)}"
    case Not(x) => s"NOT ${pretty(x)}"
    case IsNull(x, neg) => s"${pretty(x)} IS ${if (neg) "NOT " else ""}NULL"
    case In(x, l) => s"${pretty(x)} IN ${pretty(l)}"
    case Subscript(x, i) => s"${pretty(x)}[${pretty(i)}]"
    case ListLit(items) => items.map(pretty).mkString("[", ", ", "]")
    case MapLit(items) =>
      items.map { case (k, v) => s"$k: ${pretty(v)}" }.mkString("{", ", ", "}")
    case ExistsPat(_) => "exists(pattern)"
    case CaseWhen(_, _) => "case"
  }
}
