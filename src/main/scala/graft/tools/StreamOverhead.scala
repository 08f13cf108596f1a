package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.IngestStream

/** Decompose the s-gates' fixed Structured Streaming cost (VERDICT r7
  * #6): run the s01 shape (file source → watermark → tumbling-window
  * agg → parquet sink, Trigger.AvailableNow) and print, per batch,
  * Spark's own `durationMs` phase breakdown (triggerExecution =
  * addBatch + walCommit + commitOffsets + getBatch + latestOffset +
  * queryPlanning), plus the wall pieces Spark does not attribute:
  * query START (planning + checkpoint init + source listing), STOP,
  * and the sink re-read. Three iterations — the first carries JIT +
  * codegen, the later ones are the steady constant the bench pays.
  *
  * Usage: runMain graft.tools.StreamOverhead [sfDir]
  */
object StreamOverhead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")

    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-soverhead")

    (1 to 3).foreach { iter =>
      def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L
      val t0 = System.nanoTime()
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // file streams watch a directory — single-file testdata is
      // exposed through a symlink dir (the StreamQueries recipe)
      val watch = base.resolve("watch")
      java.nio.file.Files.createDirectories(watch)
      val link = watch.resolve("events.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = Tables.normalizeTs(IngestStream.eventStream(
        spark, watch.toString, raw.schema))
      val agg = IngestStream.windowedEventCounts(
        stream, watermark = "10 minutes", window_ = "5 minutes")
      val tBuild = ms(t0)

      val out = base.resolve(s"run$iter")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(out.toFile)
      val t1 = System.nanoTime()
      val q = agg.writeStream.format("parquet")
        .option("path", s"$out/out")
        .option("checkpointLocation", s"$out/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      val tStart = ms(t1)
      val t2 = System.nanoTime()
      q.awaitTermination()
      val tRun = ms(t2)
      val progress = q.recentProgress.toSeq
      val t3 = System.nanoTime()
      q.stop()
      val tStop = ms(t3)
      val t4 = System.nanoTime()
      val n = spark.read.parquet(s"$out/out").count()
      val tRead = ms(t4)

      println(s"ITER $iter build=${tBuild}ms start=${tStart}ms " +
        s"run=${tRun}ms stop=${tStop}ms sinkRead=${tRead}ms rows=$n " +
        s"total=${tBuild + tStart + tRun + tStop + tRead}ms")
      progress.zipWithIndex.foreach { case (p, i) =>
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"  batch$i rows=${p.numInputRows} $d")
      }
    }
    spark.stop()
  }
}
