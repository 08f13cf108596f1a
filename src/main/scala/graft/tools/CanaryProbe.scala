package graft.tools

/** One-number box-speed probe: the Bench canary (30 B xxhash64 folded
  * through a max over range — zero IO, zero shuffle) run standalone,
  * median of 3 after a warmup. Clean-window baseline on this box is
  * ~2.4 s; a reading near 4 means the window is ~1.7× slow (quiet
  * loadavg and zero steal included — the r14 attribution), so a full
  * 15-minute bench attempt would land canary-slow. Probe first, bench
  * when clean.
  *
  * Usage: runMain graft.tools.CanaryProbe */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkBoot.session(32, "ERROR")
    import org.apache.spark.sql.functions.{col, max, xxhash64}
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 30000000000L, 1, 32)
        .select(xxhash64(col("id")).as("h"))
        .agg(max(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // JIT/codegen warmup
    val ws = Seq(once(), once(), once()).sorted
    println(f"CANARY median=${ws(1)}%.3f s (all: ${ws.map(w => f"$w%.3f").mkString(", ")})")
    spark.stop()
  }
}
