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
  *  - output is (key, completion), joined back by the caller — which
  *    keeps retries/reruns of the expensive stage independent of the
  *    rest of the query.
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

  val DefaultBatchSize = 32

  /** Run `client` over the `(keyCol, promptCol)` pairs of `df`,
    * batching [[DefaultBatchSize]] prompts per call inside a typed
    * `mapPartitions` kernel. Returns `(key, completion)` for the
    * caller to join back — the expensive stage stays an independent,
    * retryable unit.
    */
  def completions(
      s: SparkSession,
      df: DataFrame,
      keyCol: String,
      promptCol: String,
      client: ModelClient,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import s.implicits._
    val in: Dataset[(Long, String)] =
      df.select(col(keyCol).cast("long"), col(promptCol).cast("string"))
        .as[(Long, String)]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val out = client.complete(batch.map(_._2))
        require(out.length == batch.length,
          s"model client returned ${out.length} completions for ${batch.length} prompts")
        batch.map(_._1).zip(out)
      }
    }.toDF(keyCol, "completion")
  }
}
