package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqItems.freqItems

class FreqItemsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("capacity >= distinct items gives exact counts") {
    import spark.implicits._
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++ Seq.fill(5)("d")
    val df = scala.util.Random.shuffle(data).toDF("item").repartition(8)
    val out = df.agg(freqItems(col("item"), 16, 3)).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toList == List(("a", 30L), ("b", 20L), ("c", 10L)))
  }

  test("ties order by item ascending") {
    import spark.implicits._
    val df = (Seq.fill(4)("z") ++ Seq.fill(4)("a") ++ Seq.fill(9)("m")).toDF("item")
    val out = df.agg(freqItems(col("item"), 16, 3)).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toList == List(("m", 9L), ("a", 4L), ("z", 4L)))
  }

  test("Misra-Gries guarantee under tight capacity: heavy hitters survive, undercount bounded") {
    import spark.implicits._
    // 1000 items: one heavy (400), one medium (200), 400 singletons.
    val n = 1000
    val data = Seq.fill(400)("heavy") ++ Seq.fill(200)("medium") ++
      (0 until 400).map(i => s"rare_$i")
    val df = new scala.util.Random(7).shuffle(data).toDF("item").repartition(4)
    val cap = 9
    val out = df.agg(freqItems(col("item"), cap, cap)).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // Partition-level summaries each carry error <= n_p/(cap+1); errors
    // add under merge, so the total bound is n/(cap+1) = 100.
    val bound = n / (cap + 1)
    assert(out.contains("heavy") && out.contains("medium"))
    assert(out("heavy") <= 400 && out("heavy") >= 400 - bound)
    assert(out("medium") <= 200 && out("medium") >= 200 - bound)
  }

  test("SQL registration: freq_items_sketch") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq.fill(5)("x").toDF("item").createOrReplaceTempView("fi_in")
    val out = spark.sql("SELECT freq_items_sketch(item, 8, 1) AS t FROM fi_in").head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))).toList == List(("x", 5L)))
  }

  test("corpus vocabulary fits FreqItemsCapacity (text_freq_items exactness bound)") {
    // guards the oracle: text_freq_items counts are exact (and
    // hash-match DuckDB) only while |vocab| <= capacity. If the data
    // generator ever widens the vocabulary, fail HERE with a clear
    // message instead of as a driver hash mismatch.
    import org.apache.spark.sql.functions._
    val vocab = sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).head.getLong(0)
    assert(vocab <= operators.TextAnalysis.FreqItemsCapacity,
      s"vocabulary $vocab exceeds FreqItemsCapacity " +
        s"${operators.TextAnalysis.FreqItemsCapacity}: text_freq_items is no longer exact")
  }

  test("non-string input is rejected or coerced at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 1L, 2L).toDF("n").createOrReplaceTempView("fi_long")
    // LONG is implicit-castable to STRING: must work, counting "1" twice
    val out = spark.sql("SELECT freq_items_sketch(n, 8, 1) AS t FROM fi_long").head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))).toList == List(("1", 2L)))
  }

  test("builder rejects bad capacity/k arguments with a clear error") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("x").toDF("item").createOrReplaceTempView("fi_bad")
    val e1 = intercept[Exception] {
      spark.sql("SELECT freq_items_sketch(item, item, 1) FROM fi_bad").collect()
    }
    assert(e1.getMessage.contains("capacity"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT freq_items_sketch(item, 8, -1) FROM fi_bad").collect()
    }
    assert(e2.getMessage.contains("non-positive"), e2.getMessage)
  }
}
