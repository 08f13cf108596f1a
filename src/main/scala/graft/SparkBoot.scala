package graft

import org.apache.spark.sql.SparkSession

/** The ONE local session recipe shared by every driver-facing main
  * (Bench, Verify, ScaleCheck) and dev tool (Profile, Explain,
  * PipelineProfile) — the config a plan is explained under must be the
  * config it benchmarks under, or the printed plan lies about AQE's
  * broadcast/coalescing decisions. Settings of note:
  *
  *  - `shuffle.partitions` = cpu count, not the 200 default (local
  *    mode; on a cluster this scales with executor cores);
  *  - `nanosAsLong`: events.parquet carries TIMESTAMP(NANOS);
  *  - ObjectHashAggregate fallback raised so the sketch aggregates
  *    (minhash/simhash signatures) don't fall back to sort-based agg
  *    at gate-data sizes;
  *  - AQE on (overridable via SPARK_GRAFT_AQE) + partition coalescing:
  *    measured 2× end-to-end at sf0.1;
  *  - 64 MB broadcast threshold: dimension tables up to customer-size
  *    broadcast at test scale.
  */
object SparkBoot {
  def session(cpus: Int, logLevel: String = "ERROR"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // the generated-class cache defaults to 100 entries; a 108-query
      // suite evicts ALL of them between bench passes, re-paying janino
      // compilation per pass (t44 measured 9.3 s isolated vs 11+ s
      // behind 25 polluting gates). A serving engine compiles each
      // plan once — size the cache like one (entries are weak-ref'd
      // class handles, not heap-pinned code)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r18: let AQE re-plan (and coalesce) the subtree UNDER a
      // persist() too. Default-false Spark conservatism preserves a
      // cached plan's output partitioning for downstream reuse; none
      // of our cached frames' consumers rely on that partitioning
      // (they aggregate, join via fresh exchanges, or collect), while
      // the frozen static count made every persist() materialize tiny
      // frames through `shuffle.partitions` tasks — the r17 st04
      // discovery (persist→count at 32 partitions, 904 tasks for kB of
      // data), which r17 fixed point-wise by DROPPING persists in
      // GraphStore; this closes the same hole for the remaining
      // multi-consumer persists (componentsOf's per-round labels,
      // pruneForDelete's want, Bm25 append's worklist). Measured on
      // this host: t75 2778→~700 tasks; scale-relevant on a cluster
      // too (a cached 200-partition shuffle of KB-scale metadata is
      // 200 tiny blocks every consumer refetches).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }

  /** cpu count from SPARK_GRAFT_CPUS (driver contract), default 32. */
  def cpusFromEnv: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
}
