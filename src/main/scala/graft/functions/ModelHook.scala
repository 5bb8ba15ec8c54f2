package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit seam for external model calls.
  *
  * The reference pipelines invoke an LLM at two points — a record →
  * natural-language summary (convert_json_to_text.py:120) and a judge
  * grading an answer (test_chat_assistant_with_judge.py:255). The
  * engine re-expresses both as deterministic templates so results are
  * oracle-checkable, but the integration point itself deserves a real
  * contract: at 100 TB a model call is the most expensive map in the
  * pipeline, and its Spark shape matters —
  *
  *  - it runs per PARTITION, batched (a request per row drowns in
  *    round-trips; the service's own batch limit sets `batchSize`);
  *  - it is a typed `mapPartitions` kernel, the same shape as
  *    [[graft.operators.Multimodal]]'s codec stub — an iterator →
  *    iterator function that never materializes the partition;
  *  - the client is `Serializable`, constructed ON THE EXECUTOR per
  *    partition (connections/tokens must not ship from the driver);
  *  - output is (key, completion, status, err), joined back by the
  *    caller — which keeps retries/reruns of the expensive stage
  *    independent of the rest of the query, and failures are captured
  *    PER ROW (bounded retry, then batch→per-row degradation, then an
  *    error row) instead of killing the task — the reference's
  *    continue-on-error contract.
  *
  * The container has no network/SDK, so the only shipped client is
  * [[ModelHook.StubClient]], a deterministic stand-in (md5-tagged
  * echo) that keeps every test and plan real while making the swap
  * point one constructor call.
  */
object ModelHook {

  /** Minimal model-service contract: complete a batch of prompts,
    * preserving order and length. Implementations are constructed
    * lazily on executors (declare connections `@transient lazy`).
    */
  trait ModelClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Failure a [[ModelClient]] can throw to surface a transport-level
    * status code (an HTTP status, a gRPC code) with the error; the
    * per-row failure capture in [[completions]] records it in the
    * `status` output column, mirroring the reference's
    * `judge-http-<status>` error rows. Failures without a code (parse
    * errors, timeouts surfaced as plain exceptions) record status
    * [[StatusErr]].
    */
  final case class ModelCallException(status: Int, msg: String)
    extends RuntimeException(msg)

  /** `status` value for a successful completion (HTTP OK). */
  val StatusOk = 200

  /** `status` value for a failure that carried no transport code. */
  val StatusErr = 0

  /** Deterministic stand-in for the external model: echoes a bounded
    * prefix of the prompt tagged with its md5, so outputs are stable
    * across runs/engines and visibly fake. Mirrors the reference's
    * template fallback rather than its live LLM call.
    */
  final class StubClient(tag: String) extends ModelClient {
    override def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      s"[$tag ${digest.take(8)}] ${p.take(64)}"
    }
  }

  /** Deterministic failure-injecting stand-in: succeeds like
    * [[StubClient]] except for prompts whose md5 hex starts with
    * `failHexPrefix` (a "0" prefix ≈ 1/16 of rows), which raise
    * [[ModelCallException]](503). Failure is a pure function of the
    * prompt, so a whole pipeline run through it — including the
    * batch→per-row degradation and the emitted error rows — is
    * byte-reproducible by a SQL oracle: the error PATH itself becomes
    * hash-gated, not just spec-covered. Models the reference judge
    * loop's intermittent `judge-http-<status>` failures
    * (test_chat_assistant_with_judge.py:361-377).
    */
  final class FlakyStubClient(tag: String, failHexPrefix: String) extends ModelClient {
    private val ok = new StubClient(tag)
    override def complete(prompts: Seq[String]): Seq[String] = {
      prompts.foreach { p =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        if (digest.startsWith(failHexPrefix))
          throw ModelCallException(503, "service unavailable")
      }
      ok.complete(prompts)
    }
  }

  /** Client decorator enforcing a minimum gap between successive
    * batch calls FROM ONE TASK SLOT — the knob a deployment tunes so
    * that `executors × slots × (1000/minGapMs)` stays under the model
    * service's rate limit. The reference pipelines throttle the same
    * way (a sleep between successive HTTP calls); expressing it as a
    * decorator keeps throttling composable with any client, including
    * the retry machinery in [[completions]] (retries are calls and are
    * therefore throttled too). State is per deserialized copy, i.e.
    * per task — exactly the per-slot semantics the aggregate-QPS
    * formula needs. `clock`/`sleep` are injectable for deterministic
    * tests; production uses the defaults.
    */
  final class ThrottledClient(
      inner: ModelClient,
      minGapMs: Long,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep) extends ModelClient {
    require(minGapMs >= 0, s"minGapMs must be non-negative, got $minGapMs")
    private var nextAllowed = Long.MinValue
    override def complete(prompts: Seq[String]): Seq[String] = {
      val now = clock()
      if (now < nextAllowed) sleep(nextAllowed - now)
      nextAllowed = clock() + minGapMs
      inner.complete(prompts)
    }
  }

  val DefaultBatchSize = 32

  /** Run `client` over the `(keyCol, promptCol)` pairs of `df`,
    * batching [[DefaultBatchSize]] prompts per call inside a typed
    * `mapPartitions` kernel. Returns `(key, completion, status, err)`
    * for the caller to join back — the expensive stage stays an
    * independent, retryable unit.
    *
    * Failure contract (the reference's continue-on-error semantics —
    * its judge loop records an HTTP status and a parse error PER ROW
    * and keeps going, `test_chat_assistant_with_judge.py:361-377`
    * emits `judge-http-<status>` rows rather than aborting, and
    * `test_chat_assistant.py:180` writes error rows per question):
    *
    *  - every batch call is retried up to `maxRetries` times (so
    *    transient transport failures never surface);
    *  - a batch whose retries are exhausted DEGRADES TO PER-ROW calls
    *    (each with its own retry budget), so one poison prompt costs
    *    one error row, not the batch — and never the task;
    *  - a row that still fails is emitted as
    *    `(key, completion = null, status, err = message)` with
    *    `status` from [[ModelCallException]] (else [[StatusErr]]);
    *    successful rows carry ([[StatusOk]], err = null).
    *
    * At 100 TB this is the difference between a pipeline that
    * finishes with an auditable error column and one that dies on the
    * first malformed response: a task failure would retry the WHOLE
    * partition's model calls (4 attempts of every row's cost, then
    * kill the job), while the error row costs exactly the failed
    * row's attempts and keeps the stage's output joinable.
    */
  def completions(
      s: SparkSession,
      df: DataFrame,
      keyCol: String,
      promptCol: String,
      client: ModelClient,
      batchSize: Int = DefaultBatchSize,
      maxRetries: Int = 1,
      minGapMs: Long = 0L): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(maxRetries >= 0, s"maxRetries must be non-negative, got $maxRetries")
    require(minGapMs >= 0, s"minGapMs must be non-negative, got $minGapMs")
    import s.implicits._
    val in: Dataset[(Long, String)] =
      df.select(col(keyCol).cast("long"), col(promptCol).cast("string"))
        .as[(Long, String)]
    in.mapPartitions { it =>
      // minGapMs > 0: the reference pipelines' inter-call pacing
      // (extract_chat_qa_tsv.py:48 sleep=0.05, test_chat_assistant.py
      // --delay, judge --judge-delay) as a per-task-slot gap —
      // executors × slots × (1000/minGapMs) bounds aggregate QPS.
      // Wrapped HERE, inside mapPartitions, so the throttle state
      // lives per task like any executor-side client state; 0 is a
      // true no-op (same client object, zero clock reads).
      val paced =
        if (minGapMs == 0) client else new ThrottledClient(client, minGapMs)
      def attempt(prompts: Seq[String]): Either[Throwable, Seq[String]] = {
        var last: Either[Throwable, Seq[String]] = null
        var tries = 0
        while (tries <= maxRetries && (last == null || last.isLeft)) {
          last =
            try {
              val out = paced.complete(prompts)
              require(out.length == prompts.length,
                s"model client returned ${out.length} completions for ${prompts.length} prompts")
              Right(out)
            } catch { case scala.util.control.NonFatal(e) => Left(e) }
          tries += 1
        }
        last
      }
      it.grouped(batchSize).flatMap { batch =>
        attempt(batch.map(_._2)) match {
          case Right(out) =>
            batch.map(_._1).zip(out).map { case (k, c) =>
              (k, Option(c), StatusOk, Option.empty[String])
            }
          case Left(_) =>
            // batch-level failure: adjudicate per row so only the
            // genuinely failing prompts turn into error rows
            batch.map { case (k, p) =>
              attempt(Seq(p)) match {
                case Right(out) => (k, Option(out.head), StatusOk, Option.empty[String])
                case Left(e) =>
                  val status = e match {
                    case ModelCallException(st, _) => st
                    case _ => StatusErr
                  }
                  (k, Option.empty[String], status,
                    Option(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
              }
            }
        }
      }
    }.toDF(keyCol, "completion", "status", "err")
  }
}
