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
