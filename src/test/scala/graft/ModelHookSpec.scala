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

/** JVM-static attempt counter for the failure-injection clients (same
  * singleton-sharing rationale as [[BatchSizeCollector]]).
  */
object AttemptCounter {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = calls.set(0)
}

/** Fails every FIRST attempt at a given batch (transient fault); the
  * retry must succeed without surfacing any error row.
  */
class FlakyOnceClient extends ModelHook.ModelClient {
  override def complete(prompts: Seq[String]): Seq[String] = {
    if (AttemptCounter.calls.getAndIncrement() % 2 == 0)
      throw ModelHook.ModelCallException(503, "transient upstream")
    prompts.map(p => s"ok:${p.take(8)}")
  }
}

/** Permanently rejects any prompt containing the poison marker — the
  * batch it arrives in must degrade to per-row calls, and only the
  * poison row may become an error row.
  */
/** JVM-static call-entry timestamps for the pacing test (same
  * singleton-sharing rationale as [[BatchSizeCollector]]).
  */
object CallClockCollector {
  val entries = new ConcurrentLinkedQueue[java.lang.Long]()
}

class ClockedClient extends ModelHook.ModelClient {
  private val ok = new ModelHook.StubClient("paced")
  override def complete(prompts: Seq[String]): Seq[String] = {
    CallClockCollector.entries.add(System.currentTimeMillis())
    ok.complete(prompts)
  }
}

class PoisonClient extends ModelHook.ModelClient {
  override def complete(prompts: Seq[String]): Seq[String] = {
    AttemptCounter.calls.getAndIncrement()
    prompts.map { p =>
      if (p.contains("POISON")) throw ModelHook.ModelCallException(422, s"unprocessable: ${p.take(16)}")
      else s"ok:${p.take(8)}"
    }
  }
}

class ModelHookSpec extends AnyFunSuite {
  import SparkTestSession._

  test("completions: one output per row, deterministic stub, join-back shape") {
    val docs = sources.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), concat(lit("summarize: "), col("text")).as("prompt"))
    val out = ModelHook.completions(spark, docs, "doc_id", "prompt",
      new ModelHook.StubClient("summary"))
    assert(out.columns.toSeq == Seq("doc_id", "completion", "status", "err"))
    assert(out.count() == 50)
    // deterministic across runs
    val a = out.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = ModelHook.completions(spark, docs, "doc_id", "prompt",
      new ModelHook.StubClient("summary")).orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a == b)
    assert(a.forall(_.startsWith("[summary ")))
    // all-success rows carry (200, null err)
    assert(out.filter(col("status") === ModelHook.StatusOk && col("err").isNull).count() == 50)
    // joins back 1:1
    val joined = docs.join(out, "doc_id")
    assert(joined.count() == 50)
  }

  test("completions: transient batch failure is retried, no error rows surface") {
    AttemptCounter.reset()
    val docs = sources.Tables.documents(spark, sf).limit(40)
      .select(col("doc_id"), col("text")).coalesce(1)
    val out = ModelHook.completions(spark, docs, "doc_id", "text",
      new FlakyOnceClient, batchSize = 10, maxRetries = 1).collect()
    assert(out.length == 40)
    assert(out.forall(r => r.getInt(2) == ModelHook.StatusOk && r.isNullAt(3)))
    // every batch cost exactly one failed attempt + one retry
    assert(AttemptCounter.calls.get() == 8)
  }

  test("completions: poison prompt becomes one error row, batch survives, retries bounded") {
    AttemptCounter.reset()
    import spark.implicits._
    val docs = (0L until 20L).map(i =>
        (i, if (i == 7) "POISON prompt" else s"fine prompt $i"))
      .toDF("doc_id", "text").coalesce(1)
    val maxRetries = 2
    val out = ModelHook.completions(spark, docs, "doc_id", "text",
      new PoisonClient, batchSize = 20, maxRetries = maxRetries)
      .orderBy("doc_id").collect()
    assert(out.length == 20)
    val bad = out.filter(_.getInt(2) != ModelHook.StatusOk)
    assert(bad.map(_.getLong(0)).toSeq == Seq(7L))
    assert(bad.head.isNullAt(1))
    assert(bad.head.getInt(2) == 422)
    assert(bad.head.getString(3).contains("unprocessable"))
    // the 19 healthy rows all completed despite sharing the poison batch
    assert(out.count(r => r.getInt(2) == ModelHook.StatusOk && !r.isNullAt(1)) == 19)
    // attempt accounting: (maxRetries+1) batch attempts, then per-row
    // adjudication = 19 single-row successes + (maxRetries+1) failures
    assert(AttemptCounter.calls.get() == (maxRetries + 1) + 19 + (maxRetries + 1))
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

  test("ThrottledClient: enforces the inter-call gap with injected clock, first call free") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var now = 1000L
    val inner = new ModelHook.StubClient("t")
    val c = new ModelHook.ThrottledClient(inner, minGapMs = 100,
      clock = () => now, sleep = ms => { slept += ms; now += ms })
    c.complete(Seq("a")) // first call: no wait
    assert(slept.isEmpty)
    now += 30 // 70ms short of the gap
    c.complete(Seq("b"))
    assert(slept.toSeq == Seq(70L))
    now += 500 // well past the gap
    c.complete(Seq("c"))
    assert(slept.toSeq == Seq(70L))
    // the decorated client still completes normally
    assert(c.complete(Seq("hello")).head.startsWith("[t "))
  }

  test("completions: minGapMs paces every successive client call from one task slot") {
    CallClockCollector.entries.clear()
    // one partition ⇒ one throttle state ⇒ the recorded inter-call
    // gaps are exactly the knob's contract (round 15: the reference's
    // --delay/--judge-delay pacing reachable from completions itself,
    // not only via a hand-wrapped ThrottledClient)
    val docs = sources.Tables.documents(spark, sf).limit(12)
      .select(col("doc_id"), col("text")).coalesce(1)
    val out = ModelHook.completions(spark, docs, "doc_id", "text",
      new ClockedClient, batchSize = 4, minGapMs = 120).collect()
    assert(out.length == 12)
    assert(out.forall(_.getInt(2) == ModelHook.StatusOk))
    val ts = CallClockCollector.entries.toArray(Array.empty[java.lang.Long])
      .map(_.toLong).sorted
    assert(ts.length == 3, s"expected 3 batch calls, saw ${ts.length}")
    // Thread.sleep can only oversleep; allow small clock granularity
    val gaps = ts.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(gaps.forall(_ >= 110), s"inter-call gaps $gaps violate minGapMs=120")
    // minGapMs = 0 stays a true no-op: same client path, no pacing
    CallClockCollector.entries.clear()
    ModelHook.completions(spark, docs, "doc_id", "text",
      new ClockedClient, batchSize = 4).count()
    assert(CallClockCollector.entries.size() == 3)
  }

  test("etlModelJudge: deterministic failure injection emits 503 rows for exactly the md5-'0' prompts") {
    val out = operators.Etl.etlModelJudge(spark, sf).collect()
    assert(out.nonEmpty)
    val (bad, good) = out.partition(_.getInt(2) == 503)
    // ~1/16 of prompts fail by construction; both paths must be present
    assert(bad.nonEmpty && good.nonEmpty)
    assert(bad.forall(r => r.isNullAt(1) && r.getString(3).contains("service unavailable")))
    assert(good.forall(r => r.getInt(2) == ModelHook.StatusOk && r.isNullAt(3) && r.getString(1).startsWith("[judge ")))
    // failure is a pure function of the prompt: re-run is byte-identical
    val again = operators.Etl.etlModelJudge(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("completions: misbehaving client (wrong batch length) degrades to error rows, not task death") {
    val bad = new ModelHook.ModelClient {
      override def complete(prompts: Seq[String]): Seq[String] = prompts.drop(1).map(_ => "x")
    }
    val docs = sources.Tables.documents(spark, sf).limit(10)
      .select(col("doc_id"), col("text"))
    // drops one completion per call at EVERY granularity, so even the
    // per-row adjudication fails — every row must surface as an error
    // row carrying the length-mismatch message, and the query completes
    val out = ModelHook.completions(spark, docs, "doc_id", "text", bad, maxRetries = 0).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.isNullAt(1) && r.getInt(2) == ModelHook.StatusErr))
    assert(out.forall(_.getString(3).contains("completions")))
  }
}
