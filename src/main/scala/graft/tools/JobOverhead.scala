package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: raw per-job scheduling overhead on this host — times
  * trivial jobs under different session configs. Distinguishes
  * "queries are slow" from "every job is slow", and which knob helps. */
object JobOverhead {
  def run(label: String, cpus: Int, extra: Map[String, String]): Unit = {
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(what: String)(f: => Unit): Unit = {
      val ts = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.drop(2)
      println(f"$label%-36s $what%-22s min=${ts.min}%7.1f med=${ts.sorted.apply(ts.size / 2)}%7.1f max=${ts.max}%7.1f ms")
    }
    time("range(1).count")(spark.range(1).count())
    time("range(1e6,32).count")(spark.range(0, 1000000, 1, 32).count())
    val a = spark.range(1000).toDF("k"); val bb = spark.range(100).toDF("k")
    time("bcast join tiny")(
      a.join(broadcast(bb), "k").write.mode("overwrite").format("noop").save())
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
  }

  def main(args: Array[String]): Unit = {
    run("baseline local[32]", 32, Map.empty)
    run("local[8]", 8, Map.empty)
    run("bcast.compress=false,spill=false", 32, Map(
      "spark.broadcast.compress" -> "false", "spark.shuffle.compress" -> "false"))
    run("daemon=false? N/A; serializer kryo", 32, Map(
      "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer"))
    run("local[32] again (order check)", 32, Map.empty)
  }
}
