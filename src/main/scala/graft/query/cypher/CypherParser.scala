package graft.query.cypher

import scala.util.parsing.combinator.RegexParsers
import CypherAst._

/** Recursive-descent parser for the reference's exercised Cypher
  * subset (SURVEY.md §2.2-2.8): MATCH/OPTIONAL MATCH pattern chains,
  * WHERE predicates (comparisons, boolean composition, IS [NOT] NULL,
  * CONTAINS/STARTS WITH/ENDS WITH/ILIKE, IN, CASE, EXISTS(pattern)),
  * UNWIND, WITH pipelines (MATCH may follow WITH), RETURN [DISTINCT]
  * with aggregates and aliases, ORDER BY/SKIP/LIMIT (literal or
  * `$param`), write statements (SET/REMOVE/DELETE/DETACH DELETE/
  * CREATE, connection_service.py / sec_provider.py / save_view.py
  * shapes), `//` and `/* */` comments, an optional trailing `;`, and
  * `$param` placeholders. Grammar scope is deliberately exactly the
  * §2 corpus — anything outside parses to a clear error. */
object CypherParser extends RegexParsers {

  override val skipWhitespace = true
  override val whiteSpace = "(\\s|//[^\n]*|/\\*(?:[^*]|\\*(?!/))*\\*/)+".r

  private def kw(s: String): Parser[String] = ("(?i)\\b" + s + "\\b").r ^^ (_.toUpperCase)

  private val ident: Parser[String] = "[A-Za-z_][A-Za-z0-9_]*".r
  /** Backtick-quoted identifier — the form the reference's metrics
    * templates emit for labels/rel types (`{label}` filled in). */
  private val btIdent: Parser[String] =
    "`(?:[^`]|``)+`".r ^^ (s => s.substring(1, s.length - 1).replace("``", "`"))
  private val anyIdent: Parser[String] = ident | btIdent
  private val number: Parser[Lit] =
    "-?\\d+\\.\\d+".r ^^ (s => Lit(s.toDouble)) |
      "-?\\d+".r ^^ (s => Lit(s.toLong))
  private val stringLit: Parser[Lit] =
    "'(\\\\.|[^'\\\\])*'".r ^^ (s => Lit(unescape(s.substring(1, s.length - 1)))) |
      "\"(\\\\.|[^\"\\\\])*\"".r ^^ (s => Lit(unescape(s.substring(1, s.length - 1))))

  /** Single left-to-right pass — sequential `.replace` chains corrupt
    * adjacent escapes (e.g. backslash-backslash-n). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'
          case 't' => sb += '\t'
          case c => sb += c
        }
        i += 2
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  // ---- expressions (precedence: OR < AND < NOT < cmp < add < mul) --------

  private lazy val expr: Parser[Expr] = orExpr

  private lazy val orExpr: Parser[Expr] =
    andExpr ~ rep(kw("OR") ~> andExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => Bin("OR", a, b))
    }

  private lazy val andExpr: Parser[Expr] =
    notExpr ~ rep(kw("AND") ~> notExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => Bin("AND", a, b))
    }

  private lazy val notExpr: Parser[Expr] =
    kw("NOT") ~> notExpr ^^ Not.apply | cmpExpr

  private lazy val cmpExpr: Parser[Expr] =
    addExpr ~ opt(
      kw("IS") ~ kw("NOT") ~ kw("NULL") ^^^ { (e: Expr) => IsNull(e, negated = true) } |
        kw("IS") ~ kw("NULL") ^^^ { (e: Expr) => IsNull(e, negated = false) } |
        kw("STARTS") ~ kw("WITH") ~> addExpr ^^ { r => (e: Expr) => Bin("STARTS", e, r) } |
        kw("ENDS") ~ kw("WITH") ~> addExpr ^^ { r => (e: Expr) => Bin("ENDS", e, r) } |
        kw("CONTAINS") ~> addExpr ^^ { r => (e: Expr) => Bin("CONTAINS", e, r) } |
        // ILIKE: the reference engine's case-insensitive LIKE with SQL
        // %/_ wildcards (custom_graph_demo README emits it)
        kw("ILIKE") ~> addExpr ^^ { r => (e: Expr) => Bin("ILIKE", e, r) } |
        kw("IN") ~> addExpr ^^ { r => (e: Expr) => In(e, r) } |
        ("<>" | "<=" | ">=" | "=" | "<" | ">") ~ addExpr ^^ {
          case op ~ r => (e: Expr) => Bin(op, e, r)
        }) ^^ {
      case e ~ Some(f) => f(e)
      case e ~ None => e
    }

  private lazy val addExpr: Parser[Expr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => Bin(op, a, b) }
    }

  private lazy val mulExpr: Parser[Expr] =
    unaryExpr ~ rep(("*" | "/" | "%") ~ unaryExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => Bin(op, a, b) }
    }

  private lazy val unaryExpr: Parser[Expr] =
    "-" ~> postfixExpr ^^ (e => Bin("-", Lit(0L), e)) | postfixExpr

  /** Postfix 0-based subscript: labels(m)[0], list[2] (metrics_service
    * emits the labels(...)[0] form). */
  private lazy val postfixExpr: Parser[Expr] =
    atom ~ rep("[" ~> expr <~ "]") ^^ {
      case e ~ idxs => idxs.foldLeft(e)(Subscript.apply)
    }

  private lazy val caseExpr: Parser[Expr] =
    kw("CASE") ~> rep1(kw("WHEN") ~> expr ~ (kw("THEN") ~> expr)) ~
      opt(kw("ELSE") ~> expr) <~ kw("END") ^^ {
      case whens ~ other => CaseWhen(whens.map { case c ~ v => (c, v) }, other)
    }

  /** `EXISTS((f)-[:R]->())` — pattern predicate, NOT the fnCall form
    * (must be tried before fnCall or `exists(` would parse as a
    * function of expression `(f)` and fail at the hop arrow). */
  private lazy val existsPat: Parser[Expr] =
    kw("EXISTS") ~> "(" ~> pathPat <~ ")" ^^ ExistsPat.apply

  private lazy val fnCall: Parser[Expr] =
    ident ~ ("(" ~> opt(kw("DISTINCT")) ~ repsep(expr | "*" ^^^ Star, ",") <~ ")") ^^ {
      case name ~ (distinct ~ args) =>
        FnCall(name.toLowerCase, args, distinct.isDefined)
    }

  private lazy val atom: Parser[Expr] =
    caseExpr |
      kw("NULL") ^^^ Lit(null) |
      kw("TRUE") ^^^ Lit(true) |
      kw("FALSE") ^^^ Lit(false) |
      existsPat |
      fnCall |
      "$" ~> ident ^^ Param.apply |
      ident ~ ("." ~> anyIdent) ^^ { case v ~ p => Prop(v, p) } |
      stringLit | number |
      "[" ~> repsep(expr, ",") <~ "]" ^^ ListLit.apply |
      mapProps ^^ MapLit.apply |
      "(" ~> expr <~ ")" |
      ident ^^ VarRef.apply

  // ---- patterns ----------------------------------------------------------

  /** Map keys: identifiers (incl. backticked) plus string literals —
    * the harvest normalizer renders f-string KEY holes as quoted
    * strings (neo4j.py's bulk-load map), and a quoted key is
    * unambiguous here. */
  private lazy val mapKey: Parser[String] =
    anyIdent | stringLit ^^ (_.value.toString)

  private lazy val mapProps: Parser[Seq[(String, Expr)]] =
    "{" ~> repsep(mapKey ~ (":" ~> expr) ^^ { case k ~ v => (k, v) }, ",") <~ "}"

  private lazy val nodePat: Parser[NodePat] =
    "(" ~> opt(ident) ~ opt(":" ~> anyIdent) ~ opt(mapProps) <~ ")" ^^ {
      case v ~ l ~ m => NodePat(v, l, m.getOrElse(Seq.empty))
    }

  private lazy val varLen: Parser[(Int, Int)] =
    "*" ~> opt("\\d+".r) ~ opt(".." ~> "\\d+".r) ^^ {
      case lo ~ hi =>
        val l = lo.map(_.toInt).getOrElse(1)
        // bare `*`/`*n..` = unbounded in Cypher — surfaces as the
        // compiler's "bounded to 1..5 hops" rejection, never a silent
        // single-hop reading
        (l, hi.map(_.toInt).orElse(lo.map(_.toInt)).getOrElse(Int.MaxValue))
    }

  /** Rel body with optional property map (CREATE (a)-[r:T {k: v}]->(b)
    * — write-only surface; the read compiler rejects non-empty maps). */
  private lazy val relBody
      : Parser[(Option[String], Option[String], Option[(Int, Int)], Seq[(String, Expr)])] =
    opt("[" ~> opt(ident) ~ opt(":" ~> anyIdent) ~ opt(varLen) ~ opt(mapProps) <~ "]") ^^ {
      case Some(v ~ t ~ vl ~ m) => (v, t, vl, m.getOrElse(Seq.empty))
      case None => (None, None, None, Seq.empty)
    }

  private lazy val hop: Parser[(RelPat, NodePat)] =
    ("<-" ~> relBody <~ "-") ~ nodePat ^^ {
      case (v, t, vl, m) ~ n => (RelPat(v, t, rightward = false, vl, props = m), n)
    } |
      ("-" ~> relBody <~ "->") ~ nodePat ^^ {
        case (v, t, vl, m) ~ n => (RelPat(v, t, rightward = true, vl, props = m), n)
      } |
      ("-" ~> relBody <~ "-") ~ nodePat ^^ { // undirected: union of orientations
        case (v, t, vl, m) ~ n =>
          (RelPat(v, t, rightward = true, vl, undirected = true, props = m), n)
      }

  private lazy val pathPat: Parser[PathPat] =
    nodePat ~ rep(hop) ^^ { case h ~ hops => PathPat(h, hops) }

  // ---- reading clauses ----------------------------------------------------

  private lazy val whereClause: Parser[Expr] = kw("WHERE") ~> expr

  private lazy val matchClause: Parser[ReadClause] =
    opt(kw("OPTIONAL")) ~ (kw("MATCH") ~> rep1sep(pathPat, ",")) ~ opt(whereClause) ^^ {
      case optional ~ paths ~ where => MatchClause(paths, optional.isDefined, where)
    }

  private lazy val projItem: Parser[ProjectionItem] =
    (ident <~ "." <~ "*" ^^ (v => ProjectionItem(PropStar(v), None))) |
      (expr ~ opt(kw("AS") ~> ident) ^^ { case e ~ a => ProjectionItem(e, a) })

  private lazy val withClause: Parser[ReadClause] =
    kw("WITH") ~> rep1sep(projItem, ",") ~ opt(whereClause) ^^ {
      case items ~ w => WithClause(items, w)
    }

  private lazy val unwindClause: Parser[ReadClause] =
    kw("UNWIND") ~> expr ~ (kw("AS") ~> ident) ^^ {
      case e ~ v => UnwindClause(e, v)
    }

  private lazy val readClause: Parser[ReadClause] =
    matchClause | unwindClause | withClause

  // ---- writing clauses ----------------------------------------------------

  private lazy val propRef: Parser[Prop] =
    ident ~ ("." ~> anyIdent) ^^ { case v ~ p => Prop(v, p) }

  private lazy val setItem: Parser[Either[(Prop, Expr), (String, Expr)]] =
    propRef ~ ("=" ~> expr) ^^ { case p ~ e => Left((p, e)) } |
      // `SET n += map` merge (neo4j.py bulk-load dialect)
      ident ~ ("+=" ~> expr) ^^ { case v ~ e => Right((v, e)) }

  private lazy val setClause: Parser[WriteClause] =
    kw("SET") ~> rep1sep(setItem, ",") ^^ { items =>
      SetClause(items.collect { case Left(x) => x },
        items.collect { case Right(x) => x })
    }

  private lazy val removeClause: Parser[WriteClause] =
    kw("REMOVE") ~> rep1sep(propRef, ",") ^^ RemoveClause.apply

  private lazy val deleteClause: Parser[WriteClause] =
    opt(kw("DETACH")) ~ (kw("DELETE") ~> rep1sep(ident, ",")) ^^ {
      case detach ~ vars => DeleteClause(vars, detach.isDefined)
    }

  private lazy val createClause: Parser[WriteClause] =
    kw("CREATE") ~> rep1sep(pathPat, ",") ^^ CreateClause.apply

  private lazy val mergeClause: Parser[WriteClause] =
    kw("MERGE") ~> pathPat ^^ MergeClause.apply

  private lazy val writeClause: Parser[WriteClause] =
    setClause | removeClause | deleteClause | createClause | mergeClause

  // ---- query assembly -----------------------------------------------------

  private lazy val returnClause: Parser[ReturnClause] =
    kw("RETURN") ~> opt(kw("DISTINCT")) ~ rep1sep(projItem, ",") ^^ {
      case d ~ items => ReturnClause(items, d.isDefined)
    }

  private lazy val orderItem: Parser[OrderItem] =
    expr ~ opt(kw("DESC") | kw("ASC")) ^^ {
      case e ~ d => OrderItem(e, d.contains("DESC"))
    }

  /** SKIP/LIMIT accept an integer literal or `$param`
    * (`RETURN n LIMIT $limit` — agents/context.py, query.py models). */
  private lazy val limitVal: Parser[Expr] =
    "\\d+".r ^^ (s => Lit(s.toLong)) | "$" ~> ident ^^ Param.apply

  private lazy val query: Parser[Query] =
    rep(readClause) ~ rep(writeClause) ~ opt(returnClause) ~
      opt(kw("ORDER") ~ kw("BY") ~> rep1sep(orderItem, ",")) ~
      opt(kw("SKIP") ~> limitVal) ~ opt(kw("LIMIT") ~> limitVal) ^? ({
      case cs ~ ws ~ ret ~ ob ~ skip ~ limit
          if (cs.nonEmpty || ws.nonEmpty) && (ret.nonEmpty || ws.nonEmpty) =>
        Query(cs, ws, ret, ob.getOrElse(Seq.empty), skip, limit)
    }, _ => "query needs at least one MATCH/UNWIND/CREATE clause, and " +
      "RETURN is required unless a write clause is present")

  private lazy val unionQuery: Parser[UnionQuery] =
    query ~ rep(kw("UNION") ~ opt(kw("ALL")) ~ query) <~ opt(";") ^^ {
      case h ~ t =>
        val distinct = t.exists { case _ ~ all ~ _ => all.isEmpty }
        UnionQuery(h +: t.map { case _ ~ _ ~ q => q }, distinct)
    }

  def parseQuery(text: String): Either[String, UnionQuery] =
    parseAll(unionQuery, text) match {
      case Success(q, _) => Right(q)
      case NoSuccess(msg, next) =>
        Left(s"Cypher parse error at line ${next.pos.line}, col ${next.pos.column}: $msg")
      case other => Left(s"Cypher parse error: $other")
    }

  /** `COPY (<query>) TO '<path>' [(header=true|false)]` — the engine's
    * bulk-export statement (backup_manager.py's node/rel export
    * queries). The optional parenthesized options accept only the
    * `header` flag the reference emits. */
  private lazy val copyTo: Parser[CopyTo] =
    kw("COPY") ~> "(" ~> unionQuery ~ (")" ~ kw("TO") ~> stringLit) ~
      opt("(" ~> kw("HEADER") ~> "=" ~> (kw("TRUE") | kw("FALSE")) <~ ")") ^^ {
      case q ~ p ~ h => CopyTo(q, p.value.toString, h.contains("TRUE"))
    }

  /** Top-level statement: a plain (union) query or a COPY export. */
  def parseStatement(text: String): Either[String, Statement] =
    parseAll((copyTo: Parser[Statement]) | (unionQuery: Parser[Statement]),
      text) match {
      case Success(s, _) => Right(s)
      case NoSuccess(msg, next) =>
        Left(s"Cypher parse error at line ${next.pos.line}, col ${next.pos.column}: $msg")
      case other => Left(s"Cypher parse error: $other")
    }
}
