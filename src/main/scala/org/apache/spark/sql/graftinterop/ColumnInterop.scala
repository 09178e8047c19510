package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression conversions.
  * Lives under `org.apache.spark.sql` solely to satisfy the access
  * qualifier — the standard pattern for third-party Catalyst extensions
  * (Spark 4 removed the public `new Column(Expression)` constructor).
  * Everything else in this project stays on the public API.
  */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` (the `ExpectsInputTypes.inputTypes` element
    * type) is `private[sql]` in Spark 4 — aliased here so expressions
    * outside the sql package can declare strict input types.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
