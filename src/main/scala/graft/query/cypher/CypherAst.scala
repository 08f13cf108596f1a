package graft.query.cypher

/** AST for the Cypher subset the reference platform actually emits
  * (SURVEY.md §2 corpus: trial_balance.py, fact_query.py, the MCP
  * tools, and the three demo example sets). */
object CypherAst {

  // ---- expressions -------------------------------------------------------
  sealed trait Expr
  final case class Prop(variable: String, name: String) extends Expr
  final case class VarRef(name: String) extends Expr
  final case class Param(name: String) extends Expr
  final case class Lit(value: Any) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class FnCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case object Star extends Expr // count(*)
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class In(e: Expr, list: Expr) extends Expr
  /** 0-based list index `expr[i]` (openCypher: negative = from end). */
  final case class Subscript(e: Expr, idx: Expr) extends Expr
  final case class CaseWhen(whens: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr

  // ---- patterns ----------------------------------------------------------
  final case class NodePat(
      variable: Option[String], label: Option[String],
      props: Seq[(String, Expr)])
  /** dir: true = `-[..]->`, false = `<-[..]-`. `undirected` marks
    * `-[..]-` (no arrowhead); the compiler rejects it loudly rather
    * than silently picking a direction. */
  final case class RelPat(
      variable: Option[String], relType: Option[String], rightward: Boolean,
      varLength: Option[(Int, Int)], undirected: Boolean = false)
  final case class PathPat(head: NodePat, hops: Seq[(RelPat, NodePat)])

  // ---- clauses -----------------------------------------------------------
  final case class MatchClause(
      paths: Seq[PathPat], optional: Boolean, where: Option[Expr])
  final case class ProjectionItem(expr: Expr, alias: Option[String])
  final case class WithClause(
      items: Seq[ProjectionItem], where: Option[Expr])
  final case class ReturnClause(items: Seq[ProjectionItem], distinct: Boolean)
  final case class OrderItem(expr: Expr, desc: Boolean)

  final case class Query(
      matches: Seq[MatchClause],
      withClauses: Seq[WithClause],
      ret: ReturnClause,
      orderBy: Seq[OrderItem],
      skip: Option[Long],
      limit: Option[Long],
      /** UNWIND <listExpr> AS <var> clauses (after MATCHes, before
        * WITH/RETURN) — each explodes the list into rows. */
      unwinds: Seq[(Expr, String)] = Seq.empty)

  /** One or more single queries combined with UNION ALL / UNION
    * (example_queries_tool.py:82 — per-label count branches). */
  final case class UnionQuery(branches: Seq[Query], distinct: Boolean)
}
