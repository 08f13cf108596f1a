package graft.query.cypher

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.PipelineContext
import graft.query.PatternQuery
import graft.storage.GraphStore
import CypherAst._

/** Executes Cypher WRITE statements — `MATCH … SET / REMOVE / DELETE /
  * DETACH DELETE / CREATE … [RETURN …]` — against a writable
  * [[GraphStore]]. This is the text form of the reference's write path
  * (connection_service.py SET/DETACH DELETE, sec_provider.py SET,
  * save_view.py MATCH-anchored CREATE, plaid/qb processors' DELETE);
  * the API-level equivalents live in views/SaveView.
  *
  * Semantics and batching:
  *  - the reading clauses compile once through [[CypherCompiler]] and
  *    the matched frame is materialized (checkpoint) BEFORE any table
  *    rewrite — the lazy plan reads the very parquet the writes swap;
  *  - SET/REMOVE batch into ONE rewrite per (label) with per-row
  *    values (the reference loops row-at-a-time through Cypher;
  *    one anti-join/rewrite per table is the Spark shape);
  *  - DELETE checks for attached relationships and fails loudly;
  *    DETACH DELETE removes them (openCypher constraint semantics);
  *  - CREATE inserts one node per matched row (strict ingest: duplicate
  *    keys fail) and one relationship per matched row between bound or
  *    just-created endpoints;
  *  - RETURN evaluates against the matched frame with SET assignments
  *    applied (post-write values) — for DELETE, against the pre-delete
  *    match (openCypher returns the deleted entities' snapshot);
  *  - with no RETURN, a one-row write summary comes back
  *    (propertiesSet / nodesDeleted / nodesCreated / relsCreated).
  *
  * The serving path still classifies and rejects write text on
  * read-only replicas (QueryGovernance); this executor is the write-
  * service entry point. */
final class CypherWriter(
    store: GraphStore,
    params: Map[String, Any] = Map.empty) {

  private val compiler = new CypherCompiler(store, params)

  def execute(text: String): DataFrame =
    CypherParser.parseQuery(text) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(UnionQuery(Seq(q), _)) if q.writes.nonEmpty => executeWrite(q)
      case Right(_) => compiler.run(text)
    }

  private def executeWrite(q: Query): DataFrame = {
    val spark = store.spark
    var propertiesSet = 0L
    var nodesDeleted = 0L
    var nodesCreated = 0L
    var relsCreated = 0L

    val result = PipelineContext.run { ctx =>
      // CREATE with no reading clauses (tests/conftest-style seeds)
      // anchors on a one-row frame
      val (matched0, vars) =
        if (q.clauses.isEmpty) (spark.range(1).drop("id"), Map.empty[String, String])
        else compiler.compileReads(q)
      // materialize NOW: every write below swaps parquet under this plan
      val matched = ctx.stage(matched0)
      matched.count() // forces the checkpoint before any table rewrite

      // SET/REMOVE assignments accumulate so RETURN sees updated values
      val overrides = scala.collection.mutable.Map.empty[(String, String), Column]
      // statement-scoped: a node created by one CREATE clause is a
      // legal endpoint in a LATER clause (save_view.py creates the
      // fact, then its relationships)
      val createdPk = scala.collection.mutable.Map.empty[String, Expr]

      def nodeVarLabel(v: String): String = {
        val l = vars.getOrElse(v, throw new IllegalArgumentException(
          s"write target $v is not a bound node variable"))
        require(l != PatternQuery.AnyLabel || vars.contains(v), s"unbound $v")
        l
      }
      def pkCol(v: String): Column =
        if (vars(v) == PatternQuery.AnyLabel) col(s"${v}____pk")
        else col(s"${v}__${store.schema.node(vars(v)).primaryKey}")

      def applySet(items: Seq[(Prop, Expr)]): Unit = {
        // one rewrite per target label, all of that label's assignments
        // in a single pass
        items.groupBy(_._1.variable).foreach { case (v, as) =>
          val label = nodeVarLabel(v)
          require(label != PatternQuery.AnyLabel,
            s"SET needs a labeled node variable, got label-less $v")
          val valueCols = as.map { case (p, e) =>
            overrides.update((v, p.name), compiler.toColumn(e, vars))
            compiler.toColumn(e, vars).as(p.name)
          }
          val updates = matched.select(
            (pkCol(v).cast("string").as("__key") +: valueCols): _*)
          propertiesSet += store.updateNodeProps(label, updates) * as.size
        }
      }

      q.writes.foreach {
        case SetClause(items) => applySet(items)
        case RemoveClause(targets) =>
          applySet(targets.map(p => p -> (Lit(null): Expr)))

        case DeleteClause(vs, detach) =>
          vs.foreach { v =>
            val label = nodeVarLabel(v)
            if (label == PatternQuery.AnyLabel) {
              // label-less DELETE (test_client's MATCH (n) DELETE n):
              // group matched keys by their label column
              val perLabel = matched
                .select(col(s"${v}____label").as("__l"),
                  col(s"${v}____pk").as("__key"))
                .distinct().collect()
                .groupBy(_.getString(0))
              perLabel.foreach { case (l, rows) =>
                val keys = spark.createDataFrame(
                  java.util.Arrays.asList(rows.map(r => Row(r.getString(1))).toSeq: _*),
                  StructType(Seq(StructField("__key", StringType))))
                nodesDeleted += store.deleteNodes(l, keys, detach)
              }
            } else {
              val keys = matched.select(pkCol(v).cast("string").as("__key"))
              nodesDeleted += store.deleteNodes(label, keys, detach)
            }
          }

        case CreateClause(paths) =>
          // two passes: nodes first (so rels can target just-created
          // pks), then relationships
          def nodePk(n: NodePat): Expr = {
            val v = n.variable
            v.flatMap(createdPk.get).getOrElse {
              val bv = v.getOrElse(throw new IllegalArgumentException(
                "CREATE relationship endpoints need variables"))
              require(vars.contains(bv),
                s"CREATE endpoint $bv is neither bound nor created here")
              // matched frame's pk column for the bound var
              Prop(bv, if (vars(bv) == PatternQuery.AnyLabel)
                throw new IllegalArgumentException(
                  s"CREATE endpoint $bv needs a labeled variable")
              else store.schema.node(vars(bv)).primaryKey)
            }
          }
          paths.foreach { p =>
            (p.head +: p.hops.map(_._2)).foreach { n =>
              val isNew = n.variable.forall(v => !vars.contains(v)) && n.label.nonEmpty
              if (isNew) {
                val label = n.label.get
                val d = store.schema.node(label)
                require(n.props.exists(_._1 == d.primaryKey),
                  s"CREATE (:$label {…}) must supply the primary key ${d.primaryKey}")
                val rows = matched.select(n.props.map { case (k, e) =>
                  compiler.toColumn(e, vars).as(k)
                }: _*)
                nodesCreated += store.ingestNodes(label, rows)
                n.variable.foreach { v =>
                  createdPk.update(v, n.props.find(_._1 == d.primaryKey).get._2)
                }
              }
            }
          }
          paths.foreach { p =>
            var from = p.head
            p.hops.foreach { case (rel, to) =>
              val t = rel.relType.getOrElse(throw new IllegalArgumentException(
                "CREATE relationships need a type"))
              require(!rel.undirected && rel.varLength.isEmpty,
                "CREATE relationships are typed, directed, single hops")
              val (srcPat, dstPat) = if (rel.rightward) (from, to) else (to, from)
              def evalPk(n: NodePat): Column = nodePk(n) match {
                case Prop(v, pn) if vars.contains(v) => col(s"${v}__$pn")
                case e => compiler.toColumn(e, vars)
              }
              val relProps = rel.props.map { case (k, e) =>
                compiler.toColumn(e, vars).as(k)
              }
              val pairs = matched.select(
                (evalPk(srcPat).cast("string").as("from") +:
                  evalPk(dstPat).cast("string").as("to") +: relProps): _*)
              relsCreated += store.ingestRels(t, pairs)
              from = to
            }
          }
      }

      // RETURN: matched frame with SET values overlaid (deletes return
      // the pre-delete snapshot)
      q.ret match {
        case Some(ret) =>
          var frame = matched
          overrides.foreach { case ((v, p), c) =>
            frame = frame.withColumn(s"${v}__$p", c)
          }
          val (out, _) = compiler.project(frame, vars, ret.items, ret.distinct,
            q.orderBy, keepNamespaces = false)
          // materialize before releasing the checkpoint: the projection
          // must not re-read swapped source tables
          spark.createDataFrame(
            java.util.Arrays.asList(out.collect(): _*), out.schema)
        case None =>
          import spark.implicits._
          Seq((propertiesSet, nodesDeleted, nodesCreated, relsCreated))
            .toDF("propertiesSet", "nodesDeleted", "nodesCreated", "relsCreated")
      }
    }
    result
  }
}
