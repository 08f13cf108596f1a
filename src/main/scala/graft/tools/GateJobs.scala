package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.SparkEntry

/** Dev tool: run named gates through the noop sink with a listener
  * counting Spark JOBS / STAGES / TASKS — the r17 optimization round's
  * evidence surface for the index-lifecycle gates, whose walls are
  * dominated by this host's per-job scheduling floor (SCALING.md
  * "Host variance": 0.13–0.39 s per trivial job). A gate's wall model
  * here is ≈ jobs × floor + real work, so "t74: 57 jobs → 41 jobs" is
  * the plan-shape diff that explains a wall delta the way an Exchange
  * count explains a relational one.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.GateJobs t74_crawl_takedown s10_stream_crawl"
  * Each gate runs twice (warmup + measured) so JIT/codegen noise stays
  * out of the wall; job/task counts are identical across runs by
  * construction (same code path) and reported from the measured one.
  */
object GateJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    // SPARK_GRAFT_GATEJOBS_TRACE=1: one stderr line per job with its
    // callsite — the "which operator pays which floor" breakdown the
    // aggregate counts can't answer
    val trace = sys.env.get("SPARK_GRAFT_GATEJOBS_TRACE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) {
          val p = Option(j.properties)
          def prop(k: String): String =
            p.flatMap(x => Option(x.getProperty(k))).getOrElse("")
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          // first graft frame in the submission stack — the operator
          // that paid this job's floor
          val op = j.stageInfos.lastOption
            .flatMap(_.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("GateJobs")))
            .map(_.trim.stripPrefix("at ")).getOrElse("?")
          val tasks = j.stageInfos.map(_.numTasks).sum
          System.err.println(
            s"JOBTRACE t=${j.time} id=${j.jobId} stages=${j.stageIds.size} " +
              s"tasks=$tasks exec=${prop("spark.sql.execution.id")} " +
              s"root=${prop("spark.sql.execution.root.id")} " +
              s"site=${site.takeWhile(_ != ' ')} op=${op.take(100)} " +
              s"desc=${prop("spark.job.description").take(60)}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      runOnce(name) // warmup (JIT, codegen, page cache)
      // drain async listener events from the warmup before zeroing
      // (listenerBus.waitUntilEmpty is private[spark]; a bounded sleep
      // is enough for a dev tool — events are local and in-order)
      Thread.sleep(1500L)
      jobs.set(0); stages.set(0); tasks.set(0L)
      val wall = runOnce(name)
      Thread.sleep(1500L)
      println(f"GATEJOBS $name%-28s wall=$wall%8.3f s " +
        f"jobs=${jobs.get}%-4d stages=${stages.get}%-4d tasks=${tasks.get}%-6d")
    }
    spark.stop()
  }
}
