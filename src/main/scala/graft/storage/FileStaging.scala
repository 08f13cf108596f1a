package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-upload staging (robosystems/middleware/mcp/tools/
  * data_tools.py:222-259 `ingest-file`: CSV/Excel/Parquet staged into
  * the per-graph DuckDB, then materialized into the graph). Spark
  * shape: read → register temp view (SQL passthrough surface,
  * manager.py:336-372) → GraphStore ingest. Both Excel formats read
  * on pure JDK: [[XlsxReader]] (zip+StAX OOXML) and [[XlsReader]]
  * (CFB container + BIFF8 records) — unsupported constructs (formula
  * cells, encrypted workbooks, BIFF5) fail with a clear error rather
  * than silently mis-parsing. */
object FileStaging {

  /** Stage a file (or directory of part files) as a queryable temp
    * view; format from the extension, falling back to the first data
    * file inside a directory. */
  def stage(spark: SparkSession, path: String, viewName: String,
      format: Option[String] = None): DataFrame = {
    def extOf(p: String): Option[String] = {
      val lower = p.toLowerCase
      Seq("parquet", "csv", "json", "xlsx", "xls").find(e => lower.endsWith(s".$e"))
    }
    val fmt = format.orElse(extOf(path)).orElse {
      val f = new java.io.File(path)
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .filterNot(_.getName.startsWith(("_")))
          .flatMap(x => extOf(x.getName)).headOption
      else None
    }.getOrElse(throw new IllegalArgumentException(s"unsupported staging format: $path"))
    val df = fmt match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => spark.read.json(path)
      case "xlsx" => XlsxReader.read(spark, path)
      case "xls" => XlsReader.read(spark, path)
    }
    df.createOrReplaceTempView(viewName)
    df
  }

  /** Stage + ingest into a node table in one call (the ingest-file
    * fast path). Returns rows written after dedup. */
  def ingestNodeFile(
      store: GraphStore, label: String, path: String,
      fileId: String, ignoreErrors: Boolean = true): Long = {
    val df = stage(store.spark, path, s"staged_${label.toLowerCase}")
    store.ingestNodes(label, df, Some(fileId), ignoreErrors)
  }

  /** Stage + ingest a relationship file (from/to or src/dst columns). */
  def ingestRelFile(
      store: GraphStore, tpe: String, path: String, fileId: String): Long = {
    val df = stage(store.spark, path, s"staged_${tpe.toLowerCase}")
    store.ingestRels(tpe, df, Some(fileId))
  }
}
