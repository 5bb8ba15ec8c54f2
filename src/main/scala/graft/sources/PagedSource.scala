package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paginated REST ingestion — the reference pipeline's entry point
  * (extract_chat_qa_tsv.py:44-82, `fetch_chats` /
  * `fetch_sessions_for_chat`): GET page 1, 2, … of an endpoint until
  * a page comes back empty, yielding each page's records. A user
  * porting that pipeline hits this before any transformation, so the
  * engine carries the same contract as a first-class source.
  *
  * Spark-first shape: a page-numbered API is inherently SERIAL per
  * endpoint (the loop cannot know page N+1 is last until it fetches
  * it), so the parallelism axis is ACROSS endpoints — the reference's
  * own two-level loop (every chat, then that chat's session pages)
  * made distributed. The bounded top-level directory (the chat list —
  * dimension-sized, same posture as the engine's other model-state
  * collects) pages on the driver via [[fetchAllPages]]; the per-
  * endpoint detail ingestion fans out with [[readPaged]]: endpoints
  * round-robin across executor tasks, each task page-loops its
  * endpoints inside a typed `mapPartitions` kernel that never
  * materializes more than one page per endpoint at a time, records
  * parse to columns with `from_json` against a caller-supplied schema
  * (schema-on-read — one inference pass over a 100 TB ingest would be
  * a full corpus read). At 1000 executors the aggregate request rate
  * is `tasks × pages/sec` — cap it by composing a throttling
  * [[PageClient]] the way [[graft.functions.ModelHook.ThrottledClient]]
  * wraps model calls.
  *
  * The container has no network, so the shipped client is
  * [[StubPageClient]] — a deterministic stand-in (records are a pure
  * function of (endpoint, page, slot), reproducible in SQL by the
  * correctness oracle) that keeps the page-loop contract, the
  * executor-side construction discipline, and every test real while
  * making the swap to a live HTTP client one constructor call.
  */
object PagedSource {

  /** Minimal paginated-API contract: one page of records (as JSON
    * strings) for `endpoint`; EMPTY result ⇔ past the last page (the
    * loop-termination rule of the reference API — a short final page
    * still terminates via the next fetch). Implementations are
    * `Serializable` and constructed cheaply: [[readPaged]] ships one
    * to each task (connections/tokens must be `@transient lazy`, not
    * driver state).
    */
  trait PageClient extends Serializable {
    def fetchPage(endpoint: String, page: Int, pageSize: Int): Seq[String]
  }

  val DefaultPageSize = 100

  /** Runaway guard: an API that never returns an empty page (a bug, a
    * cycling cursor) must fail loudly, not ingest forever.
    */
  val MaxPages = 100000

  /** Serial page loop over one endpoint as a lazy iterator — the
    * building block both the driver-side directory fetch and the
    * executor-side kernel share. Lazy: page N+1 is fetched only when
    * the consumer exhausts page N, so a downstream `take`/limit stops
    * issuing requests.
    */
  private def pageIterator(client: PageClient, endpoint: String,
      pageSize: Int): Iterator[String] =
    Iterator.from(1).map { p =>
      if (p > MaxPages) throw new IllegalStateException(
        s"paged source: $endpoint exceeded $MaxPages pages without an empty page")
      client.fetchPage(endpoint, p, pageSize)
    }.takeWhile(_.nonEmpty).flatten

  /** Driver-side full fetch of one endpoint — for the BOUNDED
    * top-level directory only (the reference's chat list). Unbounded
    * record streams belong in [[readPaged]].
    */
  def fetchAllPages(client: PageClient, endpoint: String,
      pageSize: Int = DefaultPageSize): Seq[String] =
    pageIterator(client, endpoint, pageSize).toSeq

  /** Distributed paged ingestion: fan `endpoints` out across tasks,
    * page-loop each serially, parse records against `schema`. Output
    * columns: `endpoint` plus the schema's fields (a record that
    * fails to parse yields typed nulls, the `from_json` PERMISSIVE
    * contract — ingestion never dies on one malformed payload).
    */
  def readPaged(s: SparkSession, endpoints: Seq[String], client: PageClient,
      schema: StructType, pageSize: Int = DefaultPageSize): DataFrame = {
    import s.implicits._
    val par = math.max(1, math.min(endpoints.size, s.sparkContext.defaultParallelism))
    s.createDataset(endpoints).repartition(par)
      .mapPartitions { it =>
        it.flatMap { ep => pageIterator(client, ep, pageSize).map(r => (ep, r)) }
      }
      .toDF("endpoint", "record")
      .withColumn("rec", from_json(col("record"), schema))
      .select(col("endpoint") +: schema.fieldNames.map(f => col(s"rec.$f").as(f)): _*)
  }

  /** Client decorator enforcing a minimum gap between successive page
    * fetches FROM ONE TASK — the aggregate-rate knob for a fleet:
    * `executors × slots × (1000/minGapMs)` requests/sec against the
    * API, tuned the same way [[graft.functions.ModelHook.ThrottledClient]]
    * throttles model calls (the reference sleeps between successive
    * HTTP calls, extract_chat_qa_tsv.py:66). State is per deserialized
    * copy, i.e. per task — exactly the per-slot semantics the
    * aggregate formula needs. `clock`/`sleep` injectable for
    * deterministic tests.
    */
  final class ThrottledPageClient(
      inner: PageClient,
      minGapMs: Long,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep) extends PageClient {
    require(minGapMs >= 0, s"minGapMs must be non-negative, got $minGapMs")
    private var nextAllowed = Long.MinValue
    override def fetchPage(endpoint: String, page: Int, pageSize: Int): Seq[String] = {
      val now = clock()
      if (now < nextAllowed) sleep(nextAllowed - now)
      nextAllowed = clock() + minGapMs
      inner.fetchPage(endpoint, page, pageSize)
    }
  }

  /** Deterministic stand-in for the paginated chat API. Serves the
    * reference's two endpoint shapes:
    *
    *  - `chats`: `numChats` records `{"chat_id": "chat_<i>"}`;
    *  - `chats/chat_<i>/sessions`: `(i % 5) + 1` session records,
    *    each with a messages array exercising every branch of the
    *    first-QA extraction (case = `(i + j) % 4`): 0 = assistant
    *    greeting + question + TWO contiguous answers + a trailing
    *    user message (greeting dropped, answers concatenated, tail
    *    ignored); 1 = plain question + answer; 2 = greeting only
    *    (empty question AND answer); 3 = question with no reply.
    *
    * Records are a pure function of (endpoint, page, slot) — the
    * DuckDB oracle regenerates the expected extraction output in
    * closed form, so a pipeline fed by this stub is fully
    * hash-gated, exactly the [[graft.functions.ModelHook.StubClient]]
    * discipline applied to ingestion.
    */
  final class StubPageClient(numChats: Int) extends PageClient {
    private val SessionsRe = "chats/chat_(\\d+)/sessions".r

    private def sessionJson(i: Int, j: Int): String = {
      def m(role: String, content: String) =
        s"""{"role":"$role","content":"$content"}"""
      val greeting = m("assistant", "hello! how can I help?")
      val q = m("user", s"q-$i-$j")
      val a1 = m("assistant", s"a-$i-$j-1")
      val a2 = m("assistant", s"a-$i-$j-2")
      val tail = m("user", s"followup-$i-$j")
      val msgs = (i + j) % 4 match {
        case 0 => Seq(greeting, q, a1, a2, tail)
        case 1 => Seq(q, a1)
        case 2 => Seq(greeting)
        case 3 => Seq(q)
      }
      s"""{"chat_id":"chat_$i","session_id":"s-$i-$j","messages":[${msgs.mkString(",")}]}"""
    }

    override def fetchPage(endpoint: String, page: Int, pageSize: Int): Seq[String] = {
      require(page >= 1, s"pages are 1-based, got $page")
      val from = (page - 1) * pageSize
      endpoint match {
        case "chats" =>
          (from until math.min(numChats, from + pageSize))
            .map(i => s"""{"chat_id":"chat_$i"}""")
        case SessionsRe(iStr) =>
          val i = iStr.toInt
          val n = (i % 5) + 1
          (from until math.min(n, from + pageSize)).map(j => sessionJson(i, j + 1))
        case other =>
          throw new IllegalArgumentException(s"stub API has no endpoint '$other'")
      }
    }
  }
}
