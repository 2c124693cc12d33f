package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives in an
  * `org.apache.spark.sql` subpackage purely to satisfy the access
  * qualifier — the standard pattern for Catalyst extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
