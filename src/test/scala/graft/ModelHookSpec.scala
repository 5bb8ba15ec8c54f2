package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ModelHook

/** JVM-static batch-size collector: the client closure is serialized
  * per task, so an instance field would diverge per copy; a singleton
  * object is shared in local mode.
  */
object BatchSizeCollector {
  val sizes = new ConcurrentLinkedQueue[Integer]()
}

class RecordingClient extends ModelHook.ModelClient {
  override def complete(prompts: Seq[String]): Seq[String] = {
    BatchSizeCollector.sizes.add(prompts.length)
    prompts.map(_ => "ok")
  }
}

class ModelHookSpec extends AnyFunSuite {
  import SparkTestSession._

  test("completions: one output per row, deterministic stub, join-back shape") {
    val docs = sources.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), concat(lit("summarize: "), col("text")).as("prompt"))
    val out = ModelHook.completions(spark, docs, "doc_id", "prompt",
      new ModelHook.StubClient("summary"))
    assert(out.columns.toSeq == Seq("doc_id", "completion"))
    assert(out.count() == 50)
    // deterministic across runs
    val a = out.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = ModelHook.completions(spark, docs, "doc_id", "prompt",
      new ModelHook.StubClient("summary")).orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a == b)
    assert(a.forall(_.startsWith("[summary ")))
    // joins back 1:1
    val joined = docs.join(out, "doc_id")
    assert(joined.count() == 50)
  }

  test("completions: prompts reach the client in batches of at most batchSize") {
    BatchSizeCollector.sizes.clear()
    val docs = sources.Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"))
    ModelHook.completions(spark, docs, "doc_id", "text", new RecordingClient, batchSize = 8).count()
    val recorded = BatchSizeCollector.sizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(recorded.nonEmpty)
    assert(recorded.forall(_ <= 8), recorded.mkString(","))
    assert(recorded.sum == 100)
  }

  test("completions: misbehaving client (wrong batch length) fails loudly") {
    val bad = new ModelHook.ModelClient {
      override def complete(prompts: Seq[String]): Seq[String] = prompts.drop(1).map(_ => "x")
    }
    val docs = sources.Tables.documents(spark, sf).limit(10)
      .select(col("doc_id"), col("text"))
    val e = intercept[Exception] {
      ModelHook.completions(spark, docs, "doc_id", "text", bad).count()
    }
    assert(e.getMessage != null)
  }
}
