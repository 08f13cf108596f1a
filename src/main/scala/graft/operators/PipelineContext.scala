package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.DatasetInternals
import scala.collection.mutable.ArrayBuffer

/** Owns the materialized intermediates of a composed pipeline.
  *
  * The dedup/curation pipelines compute tables (shingle hashes, minhash
  * signatures, annotations) that fan out into several DAG branches; each
  * must be materialized once or every branch recomputes it (measured
  * 60× at k=64 signatures). Two staging mechanisms were measured at
  * sf0.1 (round-4 profile):
  *
  *  - `persist()` (columnar InMemoryRelation): t05 4.7 s / t13 8.6 s —
  *    2-3× slower than checkpoint staging, whether materialized lazily
  *    or eagerly (the cached-subplan execution path, not duplicated
  *    work, is the cost);
  *  - LAZY `localCheckpoint` (row-based block storage): t05 1.6 s /
  *    t13 3.9 s in-suite — the fast path, but the blocks historically
  *    leaked: `Dataset.unpersist` does not reach a checkpoint's RDD, so
  *    a long-lived session degraded later queries 5-9× (round-3
  *    finding: t08 2.17 s in-suite vs 0.40 s isolated).
  *
  * This class keeps the fast path and fixes the leak: [[stage]] returns
  * the lazily-checkpointed frame AND records the checkpoint's
  * block-backed RDD; the pipeline's owner — [[PipelineContext.run]] —
  * frees every tracked RDD after the consuming action, so a long-lived
  * driver (the serving lifecycle in `graft.serve`) retains zero blocks
  * between queries. On a real cluster the same handles would be
  * persisted/bucketed tables with explicit lifecycle. */
final class PipelineContext {
  private val staged = ArrayBuffer.empty[RDD[_]]

  /** Lazily localCheckpoint `df` and remember the backing RDD for
    * [[release]]. Call on any intermediate that feeds >1 consumer.
    * The checkpoint materializes inside the first consuming action and
    * truncates lineage, so later stages plan against a leaf table. */
  def stage(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(false)
    synchronized { DatasetInternals.checkpointRdd(cp).foreach(staged += _) }
    cp
  }

  /** Free every staged checkpoint's blocks (non-blocking). Run this
    * only AFTER the consuming action — the checkpointed plans have no
    * lineage to recompute from, so any later action on them would fail. */
  def release(): Unit = synchronized { staged.foreach(_.unpersist(false)); staged.clear() }
}

object PipelineContext {
  /** Build a pipeline, consume it inside `body`, then free all staged
    * intermediates. The standard way to call the `Dedup` /
    * `CurationPipeline` operators. */
  def run[A](body: PipelineContext => A): A = {
    val ctx = new PipelineContext
    try body(ctx) finally ctx.release()
  }

  /** Adapter for SMALL results (gate queries, serving endpoints):
    * execute eagerly inside the context and hand back a local-relation
    * DataFrame, leaving zero retained blocks behind. Large outputs
    * should instead be written to a sink inside [[run]]. */
  def materialize(build: PipelineContext => DataFrame): DataFrame = run { ctx =>
    val df = build(ctx)
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
