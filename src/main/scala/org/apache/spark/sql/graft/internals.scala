package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Package-local shim: the ColumnNode→Expression converter is
  * private[sql], and graft needs the *converted* (eager) expression
  * tree to inspect unresolved function calls — aggregate detection for
  * Cypher implicit grouping. (`ExpressionUtils.expression` returns a
  * lazy ColumnNodeExpression wrapper whose children are not walkable.)
  * No Spark behavior is modified. */
object ColumnInternals {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst Expression back into a user-facing Column (the
    * public API has no constructor for this; used to expose graft's
    * custom codegen expressions, e.g. the vector-math primitives). */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}

/** Package-local shim: the block-backed RDD behind a
  * `localCheckpoint`ed Dataset (its analyzed plan is a `LogicalRDD`,
  * private[sql]). graft's PipelineContext needs the handle so a
  * long-lived serving driver can FREE the checkpoint blocks after the
  * pipeline's consuming action — `Dataset.unpersist` does not reach
  * them, and leaking them degraded later queries 5-9× (round-3
  * profile). No Spark behavior is modified. */
object DatasetInternals {
  def checkpointRdd(df: org.apache.spark.sql.Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
}
