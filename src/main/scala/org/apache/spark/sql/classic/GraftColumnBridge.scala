package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 moved the public `Column` type onto ColumnNode (the
  * connect-compatible AST) and made the classic converter's
  * helpers `private[sql]`, so a library building a Catalyst node
  * directly (e.g. an [[org.apache.spark.sql.catalyst.expressions.InSet]]
  * over a prebuilt hash set — one tree node instead of N literals) has
  * no public wrap/unwrap path. This two-line accessor lives in the
  * `org.apache.spark.sql.classic` package purely to re-export those
  * helpers to graft — the standard bridge pattern Spark-ecosystem
  * libraries use for `private[sql]` seams. No behavior is added. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
