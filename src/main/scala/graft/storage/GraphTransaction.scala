package graft.storage

/** Multi-statement write grouping (robosystems/graph_api/interfaces/
  * engine.py:65-81 `execute_transaction`). Table REWRITES (DETACH
  * DELETE's node+rel cascade) commit atomically through the graph
  * manifest (`GraphStore.commitGenerations` — one swap names every
  * table's new generation); this class covers the remaining case,
  * grouped APPENDS, as an application-level saga: every ingest in the
  * transaction shares one generated provenance id, and failure
  * triggers compensation — per-file deletes of everything the
  * transaction already wrote. The append guarantee is therefore
  * **atomicity via compensation, not isolation**: concurrent readers
  * can observe intermediate appends until commit returns (the
  * reference has the same read-uncommitted window across its
  * per-table Kuzu transactions; on Delta this class maps to one
  * commit per table + the same saga across tables). */
final class GraphTransaction(store: GraphStore) {

  val txnId: String = s"txn_${java.util.UUID.randomUUID().toString.take(12)}"
  private var nodeWrites = Vector.empty[String]
  private var relWrites = Vector.empty[String]
  private var done = false

  def ingestNodes(label: String, df: org.apache.spark.sql.DataFrame,
      ignoreErrors: Boolean = false): Long = {
    require(!done, "transaction already closed")
    // record BEFORE writing: a failure mid-write (after the parquet
    // commit) must still be compensated by rollback
    nodeWrites :+= label
    store.ingestNodes(label, df, Some(txnId), ignoreErrors)
  }

  def ingestRels(tpe: String, df: org.apache.spark.sql.DataFrame): Long = {
    require(!done, "transaction already closed")
    relWrites :+= tpe
    store.ingestRels(tpe, df, Some(txnId))
  }

  /** Undo every write of this transaction (compensation). */
  def rollback(): Unit = {
    nodeWrites.distinct.foreach(l => store.deleteFileData(l, txnId))
    relWrites.distinct.foreach(t => store.deleteRelFileData(t, txnId))
    done = true
  }

  def commit(): Unit = { done = true }

  /** Run `body`; roll back all of its writes if it throws. */
  def run[T](body: GraphTransaction => T): T =
    try { val r = body(this); commit(); r }
    catch { case t: Throwable => rollback(); throw t }
}

object GraphTransaction {
  def apply(store: GraphStore): GraphTransaction = new GraphTransaction(store)
}
