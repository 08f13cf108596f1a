package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CypherQueries, GraphQueries, PipelineQueries, RelationalQueries, StorageQueries, StreamQueries, WriteQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every implemented operator family's map;
  * `oracleSql` carries the DuckDB-dialect equivalent for each
  * SQL-expressible query (column names aligned — the driver sorts
  * columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q04MultiHopAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ GraphQueries.all ++ PipelineQueries.all ++
      CypherQueries.all ++ WriteQueries.all ++ StreamQueries.all ++
      StorageQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ GraphQueries.oracle ++ PipelineQueries.oracle ++
      CypherQueries.oracle ++ WriteQueries.oracle ++ StreamQueries.oracle ++
      StorageQueries.oracle
}
