package graft.tools

import org.apache.spark.sql.functions._

import graft.schema.{GraftType, GraphSchema, NodeDef, Property, RelDef}
import graft.storage.GraphStore

/** Scale evidence for pk-hash-bucketed point writes: at k× node rows,
  * time (a) the gen-0 ingest, (b) the first rewrite (bucketize —
  * whole-table by design), (c) a SINGLE-KEY point write (reads and
  * rewrites 1/B of the table), (d) the same-state WHOLE-TABLE rewrite
  * (the pre-bucketing shape every SET used to pay), and (e) a full
  * table read. The (d)/(c) ratio is the feature's claim; SCALING.md
  * records the measured walls per tier.
  *
  * Usage: runMain graft.tools.PointWriteScale [k ...]  (default 1 16 64)
  */
object PointWriteScale {

  private def thingSchema = GraphSchema("pwscale", "1.0",
    Seq(NodeDef("Thing", Seq(
      Property("identifier", GraftType.STRING, isPrimaryKey = true),
      Property("v", GraftType.INT64),
      Property("payload", GraftType.STRING)))),
    Nil)

  def main(args: Array[String]): Unit = {
    val ks = if (args.isEmpty) Seq(1, 16, 64) else args.map(_.toInt).toSeq
    // SPARK_GRAFT_PW_PAYLOAD: md5-repeat count per row (default 4 ≈
    // 130 B/row). Scaling BYTES per row instead of rows past ~26 M
    // keeps the ingest's window/persist row-count overhead inside the
    // local 8 GB JVM while the rewrite data term keeps growing — the
    // term the whole-vs-point ratio is about.
    val payloadRep = sys.env.getOrElse("SPARK_GRAFT_PW_PAYLOAD", "4").toInt
    val spark = graft.SparkBoot.session(graft.SparkBoot.cpusFromEnv, "ERROR")
    import spark.implicits._
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    ks.foreach { k =>
      val n = 100000L * k
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-pwscale-x$k").toString
      // the documented sizing rule: pkBuckets ≈ table bytes / target
      // file size (128 MB here) — the knob IS the point-write
      // granularity, so the harness applies it per tier as a real
      // deployment would
      val tableBytes = n * (40L + 32L * payloadRep)
      val buckets = math.max(16L, (tableBytes + (128L << 20) - 1) / (128L << 20)).toInt
      val store = new GraphStore(spark, root, "g", thingSchema,
        pkBuckets = buckets)
      val rows = spark.range(n).select(
        concat(lit("k"), col("id")).as("identifier"),
        col("id").as("v"),
        repeat(md5(col("id").cast("string")), payloadRep).as("payload"))
      // land gen-0 directly as the append-only root layout (ids are
      // unique by construction; ingestNodes' dedup + count-first
      // persist is API correctness machinery, not what this harness
      // measures — and its full-frame persist caps the local tier
      // size well below the rewrite path's)
      val tIngest = time(rows
        .write.mode("overwrite")
        .option("parquet.block.size", 32 * 1024 * 1024)
        .parquet(s"$root/g/nodes/Thing"))
      val tBucketize = time(store.updateNodeProps("Thing",
        Seq(("k0", -1L)).toDF("__key", "v")))
      val tPoint = time(store.updateNodeProps("Thing",
        Seq(("k1", -2L)).toDF("__key", "v")))
      // the pre-bucketing shape: rewrite the WHOLE table for the same
      // one-key change (touched = all buckets)
      val tWhole = time(store.commitGenerations(Seq(
        s"$root/g/nodes/Thing" -> store.node("Thing"))))
      val tRead = time(store.node("Thing")
        .write.mode("overwrite").format("noop").save())
      println(f"""PWSCALE {"k":$k,"rows":$n,"buckets":$buckets,"ingest":$tIngest%.2f,""" +
        f""""bucketize":$tBucketize%.2f,"point_write":$tPoint%.2f,""" +
        f""""whole_rewrite":$tWhole%.2f,"read_all":$tRead%.2f,""" +
        f""""whole_over_point":${tWhole / tPoint}%.1f}""")
      def rm(f: java.io.File): Boolean =
        Option(f.listFiles()).forall(_.forall(rm)) && f.delete()
      rm(new java.io.File(root)); ()
    }

    // REL tier (round 13, probe mechanism corrected r14): the TO-side
    // DETACH DELETE bill. The rel table buckets on SRC, so deleting a
    // User (the DST of LIKED) historically rewrote the WHOLE rel
    // table. The probe path scans dst+src once — with the key set as
    // a pushed LITERAL `dst IN (…)` so parquet row-group min/max
    // skipping actually fires (PointWriteSpec pins it in the plan) —
    // and rewrites only the buckets holding victims; this harness
    // times both shapes at k× rel rows for a single-node delete whose
    // in-edges all sit in ONE src bucket.
    val relSchema = GraphSchema("pwrscale", "1.0",
      Seq(NodeDef("User", Seq(
          Property("identifier", GraftType.STRING, isPrimaryKey = true))),
        NodeDef("Item", Seq(
          Property("identifier", GraftType.STRING, isPrimaryKey = true)))),
      Seq(RelDef("LIKED", "Item", "User", Seq(
        Property("payload", GraftType.STRING)))))
    ks.foreach { k =>
      val n = 100000L * k
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-pwrscale-x$k").toString
      val tableBytes = n * (40L + 32L * payloadRep)
      val buckets = math.max(16L,
        (tableBytes + (128L << 20) - 1) / (128L << 20)).toInt
      val store = new GraphStore(spark, root, "g", relSchema,
        pkBuckets = buckets)
      // users are few (delete targets); each user's n/1000 in-edges
      // all come from its paired item, so one user's victims live in
      // ONE src bucket — the shape the probe's pruning is for
      spark.range(1000).select(concat(lit("u"), col("id")).as("identifier"))
        .write.mode("overwrite").parquet(s"$root/g/nodes/User")
      val rels = spark.range(n).select(
        concat(lit("i"), pmod(col("id"), lit(1000L))).as("src"),
        concat(lit("u"), pmod(col("id"), lit(1000L))).as("dst"),
        repeat(md5(col("id").cast("string")), payloadRep).as("payload"))
      val tIngest = time(rels
        .write.mode("overwrite")
        .option("parquet.block.size", 32 * 1024 * 1024)
        .parquet(s"$root/g/rels/LIKED"))
      // first detach bucketizes LIKED (whole-table by design)
      val tBucketize = time(
        store.deleteNodes("User", Seq("u0").toDF("k"), detach = true))
      // the probe path: one dst+src column scan + a rewrite scoped to
      // the victim rows' src buckets
      val tProbe = time(
        store.deleteNodes("User", Seq("u1").toDF("k"), detach = true))
      // the pre-round-13 shape: same state change as a WHOLE-table
      // rel rewrite
      val tWhole = time(store.commitGenerations(Seq(
        s"$root/g/rels/LIKED" -> store.rel("LIKED"))))
      println(f"""PWRSCALE {"k":$k,"rel_rows":$n,"buckets":$buckets,""" +
        f""""ingest":$tIngest%.2f,"bucketize_detach":$tBucketize%.2f,""" +
        f""""probe_detach":$tProbe%.2f,"whole_rewrite":$tWhole%.2f,""" +
        f""""whole_over_probe":${tWhole / tProbe}%.1f}""")
      def rm(f: java.io.File): Boolean =
        Option(f.listFiles()).forall(_.forall(rm)) && f.delete()
      rm(new java.io.File(root)); ()
    }
    spark.stop()
  }
}
