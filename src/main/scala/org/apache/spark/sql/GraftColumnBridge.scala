package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made the Expression↔Column converters
  * (`classic.ExpressionUtils`) `private[sql]`, so this one-file shim
  * lives in the `org.apache.spark.sql` package purely to re-export
  * them for graft — the standard pattern for libraries that ship
  * native expressions.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]` in Spark 4; this alias
    * lets graft expressions declare `inputTypes` (ExpectsInputTypes /
    * ImplicitCastInputTypes) for analysis-time type checking.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** A scalar subquery over `df`'s single-row/single-column result —
    * the construct Spark's own injected runtime join filters use to
    * feed a bloom sketch to `BloomFilterMightContain` (which requires
    * a constant or scalar-subquery filter side). Executed once as a
    * subquery stage of the SAME query, so the sketch build needs no
    * separate driver-side action and no plan-embedded binary literal.
    */
  def scalarSubquery(df: Dataset[_]): Column =
    toColumn(catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed))
}
