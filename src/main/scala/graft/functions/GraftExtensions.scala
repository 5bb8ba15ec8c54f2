package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session wiring for graft's native expressions.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (also via `spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - [[GraftFunctions.register]] on an already-running session.
  *
  * Either way `dot_product(a, b)` becomes available to pure-SQL users,
  * backed by the same codegen'd expression the Scala API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotProductDescriptor)
    e.injectFunction(GraftFunctions.topKIdsDescriptor)
    e.injectFunction(GraftFunctions.freqItemsDescriptor)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBucketing)
  }
}

object GraftFunctions {
  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  private[graft] val topKIdsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_ids"),
    new ExpressionInfo(classOf[TopKIds].getName, "top_k_ids"),
    (children: Seq[Expression]) => TopKIds(children(0), children(1),
      children(2).eval().asInstanceOf[Int]).toAggregateExpression())

  private[graft] val freqItemsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("freq_items_sketch"),
    new ExpressionInfo(classOf[FreqItems].getName, "freq_items_sketch"),
    (children: Seq[Expression]) => FreqItems(children(0),
      children(1).eval().asInstanceOf[Int],
      children(2).eval().asInstanceOf[Int]).toAggregateExpression())

  /** Register graft functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_ids", exprs => TopKIds(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_items_sketch", exprs => FreqItems(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(), "scala_udf")
  }
}
