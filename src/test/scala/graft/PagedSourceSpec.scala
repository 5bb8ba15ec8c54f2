package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PagedSource

/** Paged-ingestion contract: the loop terminates on the first empty
  * page, multi-page endpoints assemble completely, the distributed
  * read equals a driver-side loop, and the runaway/malformed-payload
  * guards hold.
  */
class PagedSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sessionSchema = StructType(Seq(
    StructField("chat_id", StringType),
    StructField("session_id", StringType),
    StructField("messages", ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))))))

  test("fetchAllPages assembles the full directory across pages") {
    val client = new PagedSource.StubPageClient(9)
    // 9 chats at page size 4 = pages of 4, 4, 1, then the empty page
    val recs = PagedSource.fetchAllPages(client, "chats", pageSize = 4)
    assert(recs.length == 9)
    assert(recs.head.contains("chat_0") && recs.last.contains("chat_8"))
    // short final page also terminates: 9 chats at page size 3 = 3 full
    // pages, termination needs the page-4 empty fetch
    assert(PagedSource.fetchAllPages(client, "chats", pageSize = 3).length == 9)
  }

  test("readPaged: every session of every chat arrives, multi-page endpoints complete") {
    val client = new PagedSource.StubPageClient(9)
    val eps = (0 until 9).map(i => s"chats/chat_$i/sessions")
    val df = PagedSource.readPaged(spark, eps, client, sessionSchema, pageSize = 2)
    // chat i has (i % 5) + 1 sessions: 1+2+3+4+5+1+2+3+4 = 25
    assert(df.count() == 25)
    // chat 4 has 5 sessions = 3 pages at size 2 — all of them present
    import spark.implicits._
    val c4 = df.filter($"chat_id" === "chat_4").select("session_id")
      .as[String].collect().sorted
    assert(c4.sameElements((1 to 5).map(j => s"s-4-$j")))
    // records parsed to columns, endpoint retained
    assert(df.columns.toSeq == Seq("endpoint", "chat_id", "session_id", "messages"))
  }

  test("malformed records yield typed nulls, not a dead ingest") {
    val client = new PagedSource.PageClient {
      override def fetchPage(ep: String, page: Int, ps: Int): Seq[String] =
        if (page == 1) Seq("""{"chat_id":"ok","session_id":"s1","messages":[]}""", "not json{")
        else Seq.empty
    }
    val df = PagedSource.readPaged(spark, Seq("e"), client, sessionSchema, pageSize = 10)
    assert(df.count() == 2)
    assert(df.filter(df("chat_id").isNull).count() == 1)
  }

  test("an API that never returns an empty page fails loudly at MaxPages") {
    val client = new PagedSource.PageClient {
      override def fetchPage(ep: String, page: Int, ps: Int): Seq[String] = Seq("{}")
    }
    val e = intercept[IllegalStateException] {
      PagedSource.fetchAllPages(client, "cycling", pageSize = 1)
    }
    assert(e.getMessage.contains("MaxPages") || e.getMessage.contains("pages"))
  }

  test("throttled client: pages from one task respect the minimum gap") {
    var now = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val inner = new PagedSource.StubPageClient(9)
    val throttled = new PagedSource.ThrottledPageClient(inner, minGapMs = 100,
      clock = () => now, sleep = ms => { sleeps += ms; now += ms })
    val recs = PagedSource.fetchAllPages(throttled, "chats", pageSize = 4)
    assert(recs.length == 9)
    // 4 fetches (3 pages + the empty terminator); the first is free,
    // each later one waits out the remaining gap
    assert(sleeps.length == 3 && sleeps.forall(_ == 100))
    // results pass through unchanged
    assert(recs == PagedSource.fetchAllPages(inner, "chats", pageSize = 4))
  }

  test("stub API rejects unknown endpoints") {
    val client = new PagedSource.StubPageClient(3)
    intercept[IllegalArgumentException] {
      client.fetchPage("nope", 1, 10)
    }
  }
}
