package graft.storage

import org.apache.spark.sql.SaveMode

/** Full-graph export/import (robosystems/operations/lbug/
  * backup_manager.py full-DB `.lbug` export; backup.py:467). Spark
  * shape: one parquet dataset per table under a destination root —
  * restorable into a fresh GraphStore, portable to object storage. */
object GraphBackup {

  /** Export every materialized table; returns (table, rows) pairs. */
  def exportGraph(store: GraphStore, destRoot: String): Seq[(String, Long)] = {
    val nodeCounts = store.schema.nodes.flatMap { n =>
      val df = store.node(n.name)
      val c = df.count()
      if (c > 0) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$destRoot/nodes/${n.name}")
        Some(s"nodes/${n.name}" -> c)
      } else None
    }
    val relCounts = store.schema.rels.flatMap { r =>
      val df = store.rel(r.name)
      val c = df.count()
      if (c > 0) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$destRoot/rels/${r.name}")
        Some(s"rels/${r.name}" -> c)
      } else None
    }
    nodeCounts ++ relCounts
  }

  /** Restore an export into a (fresh) graph id under the store root. */
  def importGraph(
      store: GraphStore, srcRoot: String): Seq[(String, Long)] = {
    def existing(path: String) = new java.io.File(path).exists()
    val nodes = store.schema.nodes.flatMap { n =>
      val p = s"$srcRoot/nodes/${n.name}"
      if (existing(p))
        Some(s"nodes/${n.name}" ->
          store.ingestNodes(n.name, store.spark.read.parquet(p),
            Some("restore"), ignoreErrors = true))
      else None
    }
    val rels = store.schema.rels.flatMap { r =>
      val p = s"$srcRoot/rels/${r.name}"
      if (existing(p))
        Some(s"rels/${r.name}" ->
          store.ingestRels(r.name, store.spark.read.parquet(p), Some("restore")))
      else None
    }
    nodes ++ rels
  }
}
