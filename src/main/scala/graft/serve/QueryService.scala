package graft.serve

import org.apache.spark.sql.DataFrame
import graft.query.cypher.{CypherCompiler, CypherWriter}
import graft.storage.GraphStore

/** Graph identity rules (robosystems/middleware/graph/utils/
  * subgraph.py): user graphs are `kg<hex16+>`; a SUBGRAPH is
  * `kg<hex16+>_<name≤20>`. Only subgraphs accept writes through the
  * query endpoint (execute.py:265-283); shared repositories (any
  * non-kg id, e.g. `sec`) cannot even have subgraphs. */
object GraphIdentity {
  private val SubgraphRe = "^(kg[a-f0-9]{16,})_([a-zA-Z0-9]{1,20})$".r
  private val ParentRe = "^kg[a-f0-9]{16,}$".r

  /** (parentGraphId, subgraphName) when `graphId` is a subgraph. */
  def parseSubgraph(graphId: String): Option[(String, String)] = graphId match {
    case SubgraphRe(parent, name) => Some((parent, name))
    case _ => None
  }
  def isSubgraph(graphId: String): Boolean = parseSubgraph(graphId).isDefined
  def isUserGraph(graphId: String): Boolean =
    ParentRe.matches(graphId) || isSubgraph(graphId)
  /** Shared repositories: non-kg identifiers (`sec`, `industry`, …). */
  def isSharedRepository(graphId: String): Boolean = !isUserGraph(graphId)
}

/** Statement rejected by the serving policy (maps to HTTP 403 in the
  * reference's router). */
final class QueryRejectedException(message: String)
  extends IllegalArgumentException(message)

/** The §3.1 query endpoint's execute path: classify the statement,
  * then route — reads through the compiler (cacheable, streamable),
  * writes through [[graft.query.cypher.CypherWriter]] but ONLY on
  * subgraphs (the reference's rule: main graphs take data through the
  * staging pipeline for audit/rollback/validation, shared repositories
  * never accept writes; execute.py:265-333), bulk/admin/DDL rejected
  * with the staging-pipeline guidance. */
final class QueryService(
    store: GraphStore,
    /** driver-local result cache; entries for this graph are
      * invalidated after every successful write (the reference's
      * cache tier does the same on its write path — a stale read
      * after an acknowledged write is a correctness bug, not a
      * performance one). */
    cache: Option[ResultCache[_]] = None) {
  import QueryGovernance._

  def execute(text: String, params: Map[String, Any] = Map.empty): DataFrame =
    classify(text) match {
      case QueryKind.Read =>
        new CypherCompiler(store, params).run(text)
      case QueryKind.Write =>
        if (GraphIdentity.isSubgraph(store.graphId)) {
          val out = new CypherWriter(store, params).execute(text)
          cache.foreach(_.invalidateGraph(store.graphId))
          out
        } else if (GraphIdentity.isSharedRepository(store.graphId))
          throw new QueryRejectedException(
            s"Write operations not allowed on shared repository '${store.graphId}'")
        else
          throw new QueryRejectedException(
            "Write operations (CREATE, MERGE, SET, DELETE) are not allowed " +
              "on main graphs. The query endpoint is read-only for main " +
              "graphs; load data through the staging pipeline (file upload " +
              "+ table ingest) for audit, rollback and validation. " +
              "Subgraphs support write operations for development.")
      case QueryKind.Bulk =>
        throw new QueryRejectedException(
          "bulk COPY/LOAD runs through the staging pipeline, not the query endpoint")
      case QueryKind.Admin =>
        throw new QueryRejectedException(
          "admin commands are not available on the query endpoint")
      case QueryKind.Ddl =>
        throw new QueryRejectedException(
          "DDL runs through the schema endpoint, not the query endpoint")
    }
}
