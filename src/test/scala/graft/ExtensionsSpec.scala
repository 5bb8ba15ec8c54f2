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

  test("top_k_ids is callable from SQL after register()") {
    GraftFunctions.register(spark)
    sources.Tables.events(spark, sf).createOrReplaceTempView("ev_sql")
    val r = spark.sql(
      """SELECT event_type, top_k_ids(value, event_id, 3) AS ids
        |FROM ev_sql GROUP BY event_type ORDER BY event_type""".stripMargin).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getSeq[Long](1).length == 3))
  }

  test("quantile_sketch is callable from SQL after register()") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1L to 100L).map(_.toDouble).toDF("v").createOrReplaceTempView("qs_in")
    val r = spark.sql(
      "SELECT quantile_sketch(v, 1000, 0.25d, 0.5d, 0.99d) AS q FROM qs_in")
      .head.getSeq[Double](0)
    // exact regime (capacity >= n): discrete quantiles of 1..100
    assert(r == Seq(25.0, 50.0, 99.0), r.toString)
  }

  test("bloom sketch + probe are callable from SQL after register()") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1L to 100L).toDF("k").createOrReplaceTempView("bloom_in")
    // sketch aggregated in SQL; probe against the inlined result
    val bf = spark.sql(
      "SELECT bloom_filter_sketch(xxhash64(k), 1000, 65536) AS bf FROM bloom_in")
      .head.getAs[Array[Byte]](0)
    spark.sql("SELECT xxhash64(k) AS h FROM bloom_in").createOrReplaceTempView("bloom_probe")
    val hits = spark.sql(
      s"SELECT count(*) FROM bloom_probe WHERE bloom_might_contain(" +
        s"X'${bf.map("%02X".format(_)).mkString}', h)").head.getLong(0)
    assert(hits == 100L, "bloom filter must have no false negatives")
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
