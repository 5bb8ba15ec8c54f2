package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dot_product is callable from SQL after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head
    assert(r.getDouble(0) == 32.0)
  }

  test("GraftExtensions descriptor builds the native expression") {
    // (A full withExtensions session can't be built here: getOrCreate
    // reuses the suite session. Exercise the descriptor injectFunction
    // consumes instead.)
    val (ident, _, builder) = GraftFunctions.dotProductDescriptor
    assert(ident.funcName == "dot_product")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = Literal.create(Seq(2.0, 3.0), ArrayType(DoubleType))
    val e = builder(Seq(arr, arr))
    assert(e.isInstanceOf[graft.functions.DotProduct])
    assert(e.eval(null) == 13.0)
  }
}
