package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst Expression to a public `Column`.
  *
  * Spark 4 made `Column` wrap a ColumnNode; the converter
  * (`classic.ExpressionUtils.column`) is `private[sql]`, so third-party
  * expression libraries expose it through a shim inside the `sql` package —
  * the same pattern public Spark extension projects use (cf. SNIPPETS.md
  * examples of `org.apache.spark.sql.*` factory objects).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
