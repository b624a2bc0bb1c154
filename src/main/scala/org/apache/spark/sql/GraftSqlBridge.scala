package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for graft's
  * custom Catalyst expressions (Spark 4 classic mode hides the direct
  * `new Column(expr)` constructor behind ColumnNode plumbing).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]`, but `ImplicitCastInputTypes`
    * (public) demands `inputTypes: Seq[AbstractDataType]` — this alias
    * lets graft expressions declare coercible input types. */
  type GraftAbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
