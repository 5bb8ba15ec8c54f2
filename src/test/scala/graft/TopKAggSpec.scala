package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKIds.topKIds

class TopKAggSpec extends AnyFunSuite {
  import SparkTestSession._

  test("heap top-k agrees with the window-sort formulation") {
    val ev = sources.Tables.events(spark, sf)
    val heap = ev.groupBy(col("event_type"))
      .agg(topKIds(col("value"), col("event_id"), 5).as("top_ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .orderBy(col("event_type"), col("rn"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rows) => t -> rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("event_id")).toList }

    assert(heap.keySet == windowed.keySet)
    heap.foreach { case (t, ids) => assert(ids == windowed(t), s"type $t") }
  }

  test("k larger than group yields the whole group sorted") {
    import spark.implicits._
    val df = Seq((1.0, 10L), (3.0, 11L), (2.0, 12L)).toDF("score", "id")
    val out = df.agg(topKIds(col("score"), col("id"), 100)).head.getSeq[Long](0)
    assert(out.toList == List(11L, 12L, 10L))
  }

  test("score ties resolve toward smaller ids") {
    import spark.implicits._
    val df = Seq((5.0, 3L), (5.0, 1L), (5.0, 2L), (4.0, 0L)).toDF("score", "id")
    val out = df.agg(topKIds(col("score"), col("id"), 2)).head.getSeq[Long](0)
    assert(out.toList == List(1L, 2L))
  }
}
