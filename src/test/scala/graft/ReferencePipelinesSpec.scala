package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Etl
import graft.sources.Sinks

/** End-to-end runs of the three reference pipelines, input table →
  * transform chain → on-disk output, proving a reference user can run
  * their whole workflow on this engine:
  *
  *  1. normalize_parks_json.py: nested records → tristate flags →
  *     Yes-roll-up → CSV with header.
  *  2. extract_chat_qa_tsv.py: session messages → first-QA extraction →
  *     sanitized TSV.
  *  3. test_chat_assistant_with_judge.py: SSE transcripts → parsed
  *     answers/references + judge-JSON parse + quality color → CSV.
  */
class ReferencePipelinesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("out").toString

  /** Verbatim Scala port of the reference's
    * extract_first_qa_from_session loop (extract_chat_qa_tsv.py:84-129)
    * over already-normalized (role, content) pairs. The generated
    * contents carry no whitespace, so safe_text reduces to identity
    * and the port keeps the reference's control flow exactly: drop a
    * first-message assistant greeting once, linear scan for the first
    * user message, take-while collect of the contiguous assistant run,
    * join only the non-empty parts.
    */
  private def referenceFirstQa(messages: Seq[(String, String)]): (String, String) = {
    var msgs = messages
    if (msgs.nonEmpty && msgs.head._1 == "assistant") msgs = msgs.tail
    val userIdx = msgs.indexWhere(_._1 == "user")
    if (userIdx < 0) return ("", "")
    val userQ = msgs(userIdx)._2
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var j = userIdx + 1
    while (j < msgs.length && msgs(j)._1 == "assistant") {
      parts += msgs(j)._2
      j += 1
    }
    (userQ, parts.filter(_.nonEmpty).mkString(" "))
  }

  test("firstQa property: matches the ported reference loop on generated conversations") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val roleGen = Gen.frequency((4, Gen.const("user")),
      (4, Gen.const("assistant")), (1, Gen.const("system")))
    val contentGen = Gen.frequency(
      (5, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)),
      (1, Gen.const("")))
    val convGen = Gen.choose(0, 8)
      .flatMap(n => Gen.listOfN(n, Gen.zip(roleGen, contentGen)))
    val generated = (0 until 250)
      .flatMap(i => convGen.apply(Gen.Parameters.default, Seed(9000L + i)))
      .map(_.toVector)
    // named edge shapes from the reference's branches, always present
    val forced = Vector(
      Vector.empty[(String, String)],
      Vector("assistant" -> "greet"),
      Vector("assistant" -> "greet", "user" -> "q",
        "assistant" -> "a1", "assistant" -> "", "assistant" -> "a2"),
      Vector("assistant" -> "greet", "assistant" -> "a2"),
      Vector("system" -> "s", "user" -> "q", "assistant" -> "a",
        "system" -> "x", "assistant" -> "b"),
      Vector("user" -> "q"),
      Vector("user" -> "q1", "user" -> "q2", "assistant" -> "a"),
      Vector("assistant" -> "", "user" -> "q", "assistant" -> "a"))
    val all = (forced ++ generated).zipWithIndex
    val df = all.map { case (ms, i) => (i.toLong, ms) }.toDF("sid", "raw")
      .withColumn("msgs",
        expr("transform(raw, m -> named_struct('role', m._1, 'content', m._2))"))
      .select(col("sid"), col("msgs"))
    val res = Etl.firstQa(df)
      .select(col("sid"), col("user_question"), col("assistant_response"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    all.foreach { case (ms, i) =>
      assert(res(i.toLong) == referenceFirstQa(ms),
        s"conv $i diverged from the reference loop: $ms")
    }
  }

  test("pipeline 1: normalize -> flags -> rollup -> CSV") {
    val flags = Etl.etlTristateFlags(spark, sf)
    val features = Etl.etlActiveFeatures(spark, sf)
    val joined = flags.join(features, "doc_id")
    val path = tmp("parks")
    Sinks.writeCsv(joined, path, singleFile = true)
    val back = Sinks.readCsv(spark, path)
    assert(back.count() == flags.count())
    assert(back.columns.contains("features"))
    // tristate domain survives the round trip
    val vals = back.select("has_dup").distinct().collect().map(_.getString(0)).toSet
    assert(vals.subsetOf(Set("Yes", "No", "Don't Know")))
  }

  test("pipeline 2: sessions -> QA extraction -> sanitized TSV") {
    val qa = Etl.etlQaExtract(spark, sf)
    val path = tmp("qa")
    Sinks.writeTsv(qa, path, singleFile = true)
    val back = Sinks.readTsv(spark, path)
    assert(back.count() == qa.count())
    assert(back.columns.toSeq == Seq("user_id", "user_question", "assistant_response"))
  }

  test("pipeline 3: SSE -> parse -> judge fields -> quality color -> CSV") {
    val parsed = Etl.etlSseParse(spark, sf)
    val judged = Etl.etlJudgeJsonParse(spark, sf)
    val quality = Etl.etlQualityColor(spark, sf)
    val results = parsed
      .join(judged, "event_id")
      .limit(500)
    val path = tmp("chat")
    Sinks.writeCsv(results, path, singleFile = true)
    val back = Sinks.readCsv(spark, path)
    assert(back.count() == results.count())
    assert(back.columns.contains("answer") && back.columns.contains("judge_json"))
    // quality colors all in the reference's domain
    val colors = quality.select("quality_color").distinct().collect().map(_.getString(0)).toSet
    assert(colors.subsetOf(Set("GREEN", "YELLOW", "RED", "GRAY")))
  }

  test("SSE parse is generic over transcript layout, not position-addressed") {
    import Etl.parseSseTranscript
    // ten lines, valid chunks at unusual positions, last-wins per field
    val long = Seq(
      "event: message",
      ": comment line",
      "data: [DONE]",
      """data: {"code": 0, "data": {"answer": "a1", "session_id": "s1"}}""",
      "retry: 3000",
      """data: {"code": 1, "message": "err"}""",
      """data: not-json{{{""",
      """data: {"code": 0, "data": {"answer": "a2", "reference": {"total": 7}}}""",
      """data: null""",
      """data: {"code": 0}""").mkString("\n")
    // a2 overwrites a1; session survives from the earlier chunk; the
    // trailing data-less record changes nothing
    assert(parseSseTranscript(long) == ("a2", "s1", 7L))
    // no valid chunk at all -> reference defaults
    assert(parseSseTranscript("event: x\ndata: [DONE]") == ("", "", 0L))
    assert(parseSseTranscript("") == ("", "", 0L))
    // scalar payload is not an object record; code != '0' is dropped
    assert(parseSseTranscript("data: 5\ndata: \"str\"") == ("", "", 0L))
    // single-line transcript (no trailing sentinel) still parses
    assert(parseSseTranscript(
      """data: {"code": 0, "data": {"session_id": "only"}}""") == ("", "only", 0L))
    // later chunk with only a total keeps the earlier answer
    assert(parseSseTranscript(Seq(
      """data: {"code": 0, "data": {"answer": "keep"}}""",
      """data: {"code": 0, "data": {"reference": {"total": 3}}}""").mkString("\n")) ==
      ("keep", "", 3L))
  }

  test("composed chat-session flow: degraded rows on create failure, full rows otherwise") {
    val rows = Etl.etlChatSessions(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    byId.foreach { case (id, r) =>
      if (id % 11 == 0) {
        // create failed: the reference's degraded row, never a dropped question
        assert(r.getAs[Long]("status_code") == 500L)
        assert(r.getAs[String]("session_id") == "" && r.getAs[String]("answer") == "")
        assert(r.getAs[Long]("total_references") == 0L)
        assert(r.getAs[String]("similarities") == "")
      } else {
        assert(r.getAs[Long]("status_code") == 200L)
        assert(r.getAs[String]("session_id").startsWith("sess-"))
        if (id % 13 == 0) {
          // empty ask stream: session kept, zero references
          assert(r.getAs[String]("answer") == "")
          assert(r.getAs[Long]("total_references") == 0L)
        } else {
          assert(r.getAs[String]("answer") == s"final $id")
          // total falls back to len(chunks)=2 when the server omits it
          assert(r.getAs[Long]("total_references") == (if (id % 3 == 0) 2L else 3L))
          // falsy coercion keeps separators: null sim -> leading ", "
          if (id % 5 == 0) assert(r.getAs[String]("similarities").startsWith(", "))
        }
      }
    }
    // non-vacuity: all four row shapes occur
    assert(byId.keys.exists(_ % 11 == 0) &&
      byId.keys.exists(id => id % 11 != 0 && id % 13 == 0) &&
      byId.keys.exists(id => id % 11 != 0 && id % 13 != 0 && id % 5 == 0) &&
      byId.keys.exists(id => id % 11 != 0 && id % 13 != 0 && id % 3 != 0))
  }

  test("judge envelope parse chain: every reference fallback, in order") {
    import Etl.{parseJudgeOutput, qualityColorOf}
    val inner = """{"labels":{"answer_present":true,"answer_direct":true,"retrieval_supports_answer":true},"scores":{"overall":7},"notes":"n"}"""
    val innerEsc = inner.replace("\"", "\\\"")
    def parsedJson(raw: String): String = {
      val (p, err) = parseJudgeOutput(raw)
      assert(err == null, s"unexpected parse error: $err")
      p.toString
    }
    // 1. Messages-API envelope: content[0].text
    assert(parsedJson(
      s"""{"id":"msg_1","model":"m","content":[{"type":"text","text":"$innerEsc"}]}""") == inner)
    // 2. completion wrapper
    assert(parsedJson(s"""{"completion":"$innerEsc"}""") == inner)
    // 3. output wrapper
    assert(parsedJson(s"""{"output":"$innerEsc"}""") == inner)
    // 4. choices[0].text
    assert(parsedJson(s"""{"choices":[{"text":"$innerEsc"}]}""") == inner)
    // 5. bare judge object (has labels/scores) returns itself
    assert(parsedJson(inner) == inner)
    // 6. noisy raw text -> first {...} block
    assert(parsedJson(s"judge says: $inner -- end") == inner)
    // envelope precedence: content wins over a stray labels key
    assert(parsedJson(
      s"""{"labels":{"x":true},"content":[{"type":"text","text":"$innerEsc"}]}""") == inner)
    // candidate that is NOT JSON falls through to the brace fallback
    assert(parsedJson(s"""{"completion":"judge verdict $innerEsc trailing"}""") == inner)
    // unknown-keyed object: reserialized, whole object parsed back
    val (unknown, unknownErr) = parseJudgeOutput("""{"foo":1,"bar":"b"}""")
    assert(unknownErr == null && unknown.toString == """{"foo":1,"bar":"b"}""")
    // failures: empty, no braces, broken braces
    assert(parseJudgeOutput("")._2 == "empty judge response")
    assert(parseJudgeOutput("no structured output")._2 == "unable to parse judge JSON")
    assert(parseJudgeOutput("{not json")._2 == "unable to parse judge JSON")
    assert(parseJudgeOutput("x {broken} ")._2.startsWith("failed to parse inner JSON") ||
      parseJudgeOutput("x {broken} ")._2 == "unable to parse judge JSON")

    // quality ladder over parsed labels: defaults per the reference
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def color(json: String) = qualityColorOf(m.readTree(json))
    assert(color("{}") == "GRAY")
    assert(qualityColorOf(null) == "GRAY")
    assert(color("""{"answer_wrong":true,"answer_direct":true}""") == "RED")
    assert(color("""{"answer_present":false}""") == "RED")
    assert(color("""{"answer_present":true,"retrieval_supports_answer":false}""") == "RED")
    assert(color("""{"answer_present":true,"answer_partial":true}""") == "YELLOW")
    assert(color("""{"answer_present":true,"retrieval_complete":false}""") == "YELLOW")
    assert(color("""{"answer_present":true,"answer_direct":true,"retrieval_supports_answer":true}""") == "GREEN")
    // direct alone is not GREEN: retrieval_supports_answer defaults
    // FALSE for the positive rule (though TRUE for the negated RED rule)
    assert(color("""{"answer_present":true,"answer_direct":true}""") == "YELLOW")
    assert(color("""{"answer_present":true}""") == "YELLOW")
  }
}
