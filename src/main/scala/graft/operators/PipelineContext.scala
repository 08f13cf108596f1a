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
  * 60× at k=64 signatures). Two staging mechanisms, both owned and
  * freed by this context (round-3 finding: leaked checkpoint blocks
  * degraded later queries in a long-lived session 5-9×; round-4
  * profile: `Dataset.unpersist` does not reach a checkpoint's RDD):
  *
  *  - [[stage]] — LAZY `localCheckpoint` (row-based block storage).
  *    Faster end-to-end for the wide minhash pipelines (t05 2.0 s vs
  *    2.9 s persisted, t13 3.5 s vs 6.3 s at sf0.1) but plans the
  *    subtree eagerly at construction;
  *  - [[stagePersist]] — columnar `persist()`. No construction-time
  *    planning and faster for NARROW frames (t06's (id, long) table:
  *    1.1 s vs 1.6 s checkpointed), slower for array-heavy ones
  *    (columnar encode of 64-long signature arrays).
  *
  * On a real cluster the same handles would be persisted/bucketed
  * tables with explicit lifecycle. */
final class PipelineContext {
  private val staged = ArrayBuffer.empty[RDD[_]]
  private val persisted = ArrayBuffer.empty[DataFrame]
  private val scratch = ArrayBuffer.empty[java.nio.file.Path]

  /** A DISK-staged scratch directory (parquet landing zone) owned by
    * this context — for operators that bound peak executor memory by
    * materializing intermediate partials per segment ([[Dedup
    * .jaccardPairsExact]]'s blocked candidate join). Deleted on
    * [[release]], so callers must consume (or copy out) before the
    * context closes — the same contract as [[stage]]. On a cluster
    * this would be a job-scoped path on shared storage.
    *
    * AQE can launch a speculative broadcast job over a scratch-backed
    * side that the final plan no longer needs; that straggler can
    * still be READING these files right after the consuming action
    * returns. [[release]] therefore waits for job quiescence (bounded)
    * before deleting — without the barrier the straggler dies with
    * `FAILED_READ_FILE`, observed round-9 as a task-retry WARN and one
    * hard gate failure (Round10ReviewSpec reproduces it on demand). */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    synchronized { scratch += p }
    p.toString
  }

  /** Lazily localCheckpoint `df` and remember the backing RDD for
    * [[release]]. Call on any intermediate that feeds >1 consumer.
    * The checkpoint materializes inside the first consuming action and
    * truncates lineage, so later stages plan against a leaf table. */
  def stage(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(false)
    synchronized { DatasetInternals.checkpointRdd(cp).foreach(staged += _) }
    cp
  }

  /** Free ONE staged frame's blocks before the context closes — for
    * operators that copy a checkpoint to disk-backed scratch mid-plan
    * and must not keep both resident (the segmented exact-Jaccard
    * path). The frame must not be referenced afterwards: a local
    * checkpoint has no lineage to recompute from. */
  def unstage(df: DataFrame): Unit = synchronized {
    DatasetInternals.checkpointRdd(df).foreach { r =>
      r.unpersist(false)
      val i = staged.indexWhere(_ eq r)
      if (i >= 0) staged.remove(i)
    }
  }

  /** Persist `df` (columnar cache) and remember the handle for
    * [[release]]. Prefer for narrow intermediates; see class doc. */
  def stagePersist(df: DataFrame): DataFrame = {
    val p = df.persist()
    synchronized { persisted += p }
    p
  }

  /** Free every staged intermediate's blocks (non-blocking). Run this
    * only AFTER the consuming action — checkpointed plans have no
    * lineage to recompute from, so any later action on them would fail. */
  def release(): Unit = synchronized {
    staged.foreach(_.unpersist(false)); staged.clear()
    persisted.foreach(_.unpersist(false)); persisted.clear()
    // Quiesce BEFORE deleting scratch: AQE can still be running a
    // speculative broadcast job over a scratch-backed side right after
    // the consuming action has returned (see [[scratchDir]]). Deleting
    // under that straggler turns it into FAILED_READ_FILE — observed
    // as a task-retry WARN and, once, a hard gate failure in a combined
    // run (round-9 t42 flake). Waiting for job quiescence lets the
    // straggler finish against LIVE files; the wait is bounded (other
    // concurrent work in shared-JVM test runs must not stall cleanup)
    // and only paid on the rare scratch-using paths.
    if (scratch.nonEmpty) PipelineContext.quiesceJobs(2000L)
    scratch.foreach { p =>
      // close the walk stream (it holds a directory handle) and keep a
      // concurrently-removed dir from aborting the remaining cleanups;
      // anything else (held handle, permissions) leaks the dir — say so
      import scala.jdk.CollectionConverters._
      try {
        val s = java.nio.file.Files.walk(p)
        val all = try s.iterator().asScala.toSeq finally s.close()
        all.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      } catch {
        case _: java.nio.file.NoSuchFileException => ()
        case e: java.io.IOException =>
          System.err.println(s"[graft] leaked scratch dir $p: $e")
      }
    }
    scratch.clear()
  }
}

object PipelineContext {
  /** Bounded wait for the active SparkContext to report no running
    * jobs — the pre-delete barrier for scratch dirs (see [[release]]).
    * Returns quietly on timeout: a long-running unrelated job (shared
    * test JVM) must not block cleanup forever, and the straggler this
    * guards against finishes in milliseconds. */
  private[graft] def quiesceJobs(maxWaitMs: Long): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext).filterNot(_.isStopped).foreach { sc =>
        val deadline = System.currentTimeMillis() + maxWaitMs
        while (sc.statusTracker.getActiveJobIds().nonEmpty &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(10L)
      }

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
