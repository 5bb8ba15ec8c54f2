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
    e.injectFunction(GraftFunctions.quantileSketchDescriptor)
    e.injectFunction(GraftFunctions.bloomAggDescriptor)
    e.injectFunction(GraftFunctions.mightContainDescriptor)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBucketing)
  }
}

object GraftFunctions {
  /** Extract a constant positive-int argument (`k`, `capacity`) at
    * plan-build time. Non-foldable expressions, nulls, non-integral
    * types and BIGINT-out-of-range literals all get a clear
    * AnalysisException naming the function and argument instead of a
    * ClassCastException/NPE deep in plan construction.
    */
  private def constIntArg(fn: String, arg: String, e: Expression): Int = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$fn(): argument '$arg' must be a constant positive INT literal, but $why"))
    if (!e.foldable) fail(s"got the non-foldable expression ${e.sql}")
    val v = e.eval() match {
      case null => fail("got NULL")
      case i: Int => i
      case l: Long => if (l.isValidInt) l.toInt else fail(s"$l overflows INT")
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => fail(s"got ${other.getClass.getSimpleName} '$other'")
    }
    if (v <= 0) fail(s"got non-positive value $v")
    v
  }

  private def topKIdsBuilder(children: Seq[Expression]): Expression =
    TopKIds(children(0), children(1),
      constIntArg("top_k_ids", "k", children(2))).toAggregateExpression()

  private def freqItemsBuilder(children: Seq[Expression]): Expression =
    FreqItems(children(0),
      constIntArg("freq_items_sketch", "capacity", children(1)),
      constIntArg("freq_items_sketch", "k", children(2))).toAggregateExpression()

  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  private[graft] val topKIdsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_ids"),
    new ExpressionInfo(classOf[TopKIds].getName, "top_k_ids"),
    topKIdsBuilder _)

  private[graft] val freqItemsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("freq_items_sketch"),
    new ExpressionInfo(classOf[FreqItems].getName, "freq_items_sketch"),
    freqItemsBuilder _)

  /** `quantile_sketch(value, capacity, p1[, p2...])`: probe ranks as
    * constant double literals. */
  private def quantileSketchBuilder(children: Seq[Expression]): Expression = {
    def constDouble(e: Expression): Double = {
      if (!e.foldable)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            "quantile_sketch(): probe ranks must be constant literals"))
      e.eval() match {
        case d: Double => d
        case f: Float => f.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other =>
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              s"quantile_sketch(): probe rank '$other' is not numeric"))
      }
    }
    QuantileSketch(children(0),
      constIntArg("quantile_sketch", "capacity", children(1)),
      children.drop(2).map(constDouble)).toAggregateExpression()
  }

  private[graft] val quantileSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantile_sketch"),
    new ExpressionInfo(classOf[QuantileSketch].getName, "quantile_sketch"),
    quantileSketchBuilder _)

  private def bloomAggBuilder(children: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      children(0),
      org.apache.spark.sql.catalyst.expressions.Literal(
        constLongArg("bloom_filter_sketch", "estimatedItems", children(1))),
      org.apache.spark.sql.catalyst.expressions.Literal(
        constLongArg("bloom_filter_sketch", "numBits", children(2))),
      0, 0).toAggregateExpression()

  private def mightContainBuilder(children: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      children(0), children(1))

  private def constLongArg(fn: String, arg: String, e: Expression): Long =
    constIntArg(fn, arg, e).toLong

  private[graft] val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_filter_sketch"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_sketch"),
    bloomAggBuilder _)

  private[graft] val mightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    mightContainBuilder _)

  /** Register graft functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_ids", topKIdsBuilder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_items_sketch", freqItemsBuilder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch", quantileSketchBuilder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_sketch", bloomAggBuilder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", mightContainBuilder _, "scala_udf")
  }
}
