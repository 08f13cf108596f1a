package graft.tools

/** Dev scratch: (re)generate the committed fixture-differential
  * expectations under fixtures/ from the live pipelines. Run AFTER the
  * corresponding spec pins the semantics independently — the fixture
  * is the oracle, so it must never be regenerated to paper over a
  * behavior change (the spec would catch that first). */
object GenFixtures {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkBoot.session(8, "ERROR")
    val df = graft.operators.PipelineQueries
      .t57ImageNearDup(spark, "/root/testdata/sf0.001")
    val tmp = "/tmp/graft-fixture-gen/t57"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("fixtures"))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get("fixtures/t57_expected.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"t57_expected.parquet: ${df.count()} rows")
    spark.stop()
  }
}
