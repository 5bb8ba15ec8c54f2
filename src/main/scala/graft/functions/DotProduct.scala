package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>`
  * columns.
  *
  * The composable form (`aggregate(zip_with(a, b, ...), ...)`)
  * materializes an intermediate 64-element array per row — at 2M+
  * candidate pairs that is the allocation hot path. This expression
  * generates a tight primitive loop inside whole-stage codegen
  * instead: no allocation, no virtual calls, auto-vectorizable.
  *
  * Accumulation is sequential left-to-right, bit-compatible with the
  * `aggregate(zip_with(...))` formulation and the DuckDB
  * `list_reduce` oracles.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column builder: `dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      DotProduct(GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
