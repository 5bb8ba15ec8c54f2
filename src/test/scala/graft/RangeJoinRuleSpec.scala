package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinBucketing

class RangeJoinRuleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairsDf = {
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val a = ev.select(col("event_id").as("ea"), col("us").as("usa"))
    val b = ev.select(col("event_id").as("eb"), col("us").as("usb"))
    // pure range join: NO equality keys -> nested loop without the rule
    a.join(b, (col("usb") - col("usa")).between(0L, 300L * 1000000L) &&
      col("ea") < col("eb"))
      .select(col("ea"), col("eb"))
  }

  test("rule rewrites a pure range join into a bucketed equi-join") {
    val before = pairsDf.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      s"expected a nested loop without the rule:\n$before")
    // sorted multiset compare: a Set would hide duplicate-row
    // regressions (e.g. a pair matching via both probe buckets)
    val baseline = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    try {
      val after = pairsDf.queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        s"rule did not eliminate the nested loop:\n$after")
      val rewritten = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rewritten == baseline, "rewritten join changed the results")
      assert(rewritten.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule leaves equi-joins alone") {
    spark.experimental.extraOptimizations = Seq(RangeJoinBucketing)
    try {
      val plan = SparkEntry.queries("q3_shipping_priority")(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains(RangeJoinBucketing.BucketCol))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }
}
