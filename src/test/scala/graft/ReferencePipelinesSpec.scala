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
}
