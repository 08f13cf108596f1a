package graft.query.cypher

/** AST for the Cypher subset the reference platform actually emits
  * (SURVEY.md §2 corpus: trial_balance.py, fact_query.py, the MCP
  * tools, the connection/provider services' write statements, and the
  * three demo example sets). */
object CypherAst {

  // ---- expressions -------------------------------------------------------
  sealed trait Expr
  final case class Prop(variable: String, name: String) extends Expr
  final case class VarRef(name: String) extends Expr
  final case class Param(name: String) extends Expr
  final case class Lit(value: Any) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  /** `{k: expr, …}` map literal (element_mapping.py's
    * `collect({identifier: a.identifier, …})`) — compiles to a
    * named struct. */
  final case class MapLit(items: Seq[(String, Expr)]) extends Expr
  final case class FnCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case object Star extends Expr // count(*)
  /** `v.*` star projection (backup_manager.py's export queries):
    * expands to every property column of `v`, named by bare property
    * name — the engine's COPY/export column convention. */
  final case class PropStar(variable: String) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class In(e: Expr, list: Expr) extends Expr
  /** 0-based list index `expr[i]` (openCypher: negative = from end). */
  final case class Subscript(e: Expr, idx: Expr) extends Expr
  final case class CaseWhen(whens: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr
  /** `EXISTS((f)-[:R]->())` pattern predicate (facts_tool.py's
    * dimension filter) — compiles to a semi join (anti under NOT). */
  final case class ExistsPat(path: PathPat) extends Expr

  // ---- patterns ----------------------------------------------------------
  final case class NodePat(
      variable: Option[String], label: Option[String],
      props: Seq[(String, Expr)])
  /** dir: true = `-[..]->`, false = `<-[..]-`. `undirected` marks
    * `-[..]-` (no arrowhead); the compiler unions both orientations. */
  final case class RelPat(
      variable: Option[String], relType: Option[String], rightward: Boolean,
      varLength: Option[(Int, Int)], undirected: Boolean = false,
      /** inline property map — CREATE-only surface; reads reject it. */
      props: Seq[(String, Expr)] = Seq.empty)
  final case class PathPat(head: NodePat, hops: Seq[(RelPat, NodePat)])

  // ---- reading clauses (any order, processed left to right) --------------
  sealed trait ReadClause
  final case class MatchClause(
      paths: Seq[PathPat], optional: Boolean, where: Option[Expr]) extends ReadClause
  final case class WithClause(
      items: Seq[ProjectionItem], where: Option[Expr]) extends ReadClause
  /** UNWIND <listExpr> AS <var> — explodes the list into rows. */
  final case class UnwindClause(expr: Expr, variable: String) extends ReadClause

  final case class ProjectionItem(expr: Expr, alias: Option[String])
  final case class ReturnClause(items: Seq[ProjectionItem], distinct: Boolean)
  final case class OrderItem(expr: Expr, desc: Boolean)

  // ---- writing clauses (connection_service / sec_provider / save_view /
  // plaid+qb processors: MATCH … SET/REMOVE/DELETE/CREATE [RETURN …]) ------
  sealed trait WriteClause
  /** `SET n.p = e, …` plus `SET n += map` merge items (neo4j.py:340's
    * bulk-load dialect) — merges expand to per-key assignments at
    * execution time. */
  final case class SetClause(
      items: Seq[(Prop, Expr)],
      merges: Seq[(String, Expr)] = Nil) extends WriteClause
  final case class RemoveClause(targets: Seq[Prop]) extends WriteClause
  final case class DeleteClause(vars: Seq[String], detach: Boolean) extends WriteClause
  final case class CreateClause(paths: Seq[PathPat]) extends WriteClause
  /** `MERGE (v:L {key: v})` node upsert / `MERGE (a)-[:R]->(b)` rel
    * upsert (plaid transactions.py, connection_service.py:227). */
  final case class MergeClause(path: PathPat) extends WriteClause

  /** One single query: reading clauses in source order, optional write
    * clauses, then RETURN (optional only when writes are present).
    * skip/limit are expressions so `LIMIT $param` binds at compile. */
  final case class Query(
      clauses: Seq[ReadClause],
      writes: Seq[WriteClause],
      ret: Option[ReturnClause],
      orderBy: Seq[OrderItem],
      skip: Option[Expr],
      limit: Option[Expr]) {
    /** MATCH clauses in order (governance/telemetry convenience). */
    def matches: Seq[MatchClause] = clauses.collect { case m: MatchClause => m }
  }

  /** One or more single queries combined with UNION ALL / UNION
    * (example_queries_tool.py:82 — per-label count branches). */
  final case class UnionQuery(branches: Seq[Query], distinct: Boolean)
    extends Statement

  /** A top-level statement: a (union) query, or the engine's
    * bulk-export dialect around one. */
  sealed trait Statement

  /** `COPY (<query>) TO '<path>' [(header=true|false)]` — the
    * reference engine's bulk-export statement
    * (robosystems/operations/lbug/backup_manager.py): run the inner
    * query, write the result as CSV at `path`. */
  final case class CopyTo(query: UnionQuery, path: String, header: Boolean)
    extends Statement
}
