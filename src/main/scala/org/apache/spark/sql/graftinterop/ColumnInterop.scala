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

  /** A DataFrame's result as a scalar-subquery EXPRESSION (the frame
    * must be a one-row, one-column aggregate). This is how Catalyst's
    * own InjectRuntimeFilter feeds a `BloomFilterAggregate` into
    * `BloomFilterMightContain`, which accepts only constants or scalar
    * subqueries — the subquery executes once and its value is shared,
    * never re-evaluated per row.
    */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed))

  /** `AbstractDataType` (the `ExpectsInputTypes.inputTypes` element
    * type) is `private[sql]` in Spark 4 — aliased here so expressions
    * outside the sql package can declare strict input types.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
