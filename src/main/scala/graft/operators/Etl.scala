package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.2 — the reference's ETL surface re-expressed Spark-first.
  *
  * Every reference Python loop becomes a codegen'd column expression
  * (regex/CASE) or a higher-order array function; there are no Scala
  * UDFs anywhere in this module, so all of it stays inside
  * whole-stage codegen and scales linearly with partition count.
  */
object Etl {

  // ------------------------------------------------------------------
  // Tristate keyword classification (normalize_parks_json.py:50-58).
  // ------------------------------------------------------------------

  /** Keyword flag maps over the documents vocabulary — same shape as
    * the reference's facilities/restrictions/... maps
    * (normalize_parks_json.py:66-129).
    */
  val flagMap: Seq[(String, Seq[String])] = Seq(
    "has_dup" -> Seq("dup", "dups"),
    "is_slow" -> Seq("slow"),
    "has_vector" -> Seq("vector", "vectors"),
    "has_stream" -> Seq("stream", "streaming"))

  /** Yes / No / Don't Know from keyword patterns. Precedence matches
    * the reference's `np.select([yes, no], ...)`: a Yes match wins even
    * when a "no &lt;kw&gt;" phrase is also present.
    */
  def tristate(source: Column, patterns: Seq[String]): Column = {
    val alts = patterns.map(java.util.regex.Pattern.quote).mkString("|")
    val yes = lower(source).rlike(s"\\b(?:$alts)\\b")
    val no = lower(source).rlike(s"\\bno\\s+(?:$alts)\\b")
    when(yes, "Yes").when(no, "No").otherwise("Don't Know")
  }

  private def withFlags(df: DataFrame): DataFrame =
    flagMap.foldLeft(df) { case (acc, (name, pats)) =>
      acc.withColumn(name, tristate(col("text"), pats))
    }

  // Flag regexes are projected ABOVE the final sort here and in
  // etlActiveFeatures: a global sort's range exchange samples its
  // child, so heavy projections below the sort run twice (see
  // Curation.curPiiRedact's Scaladoc for the measured effect).
  def etlTristateFlags(s: SparkSession, d: String): DataFrame =
    withFlags(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")))
      .select(col("doc_id") +: flagMap.map(f => col(f._1)): _*)

  /** `other_*` passthrough: keep the raw text only when no keyword of
    * any flag matched (substring semantics, not word-bounded — faithful
    * to normalize_parks_json.py:173-175).
    */
  def etlOtherText(s: SparkSession, d: String): DataFrame = {
    val allKw = flagMap.flatMap(_._2).mkString("|")
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(!lower(col("text")).rlike(allKw), col("text")).as("other_text"))
      .orderBy(col("doc_id"))
  }

  /** Yes-flag roll-up → `metadata.features` analog: comma-joined flag
    * names (underscores → spaces) where the tristate is Yes
    * (normalize_parks_json.py:203-208). `concat_ws` drops NULLs, which
    * re-expresses the reference's list-comprehension filter.
    */
  def etlActiveFeatures(s: SparkSession, d: String): DataFrame =
    withFlags(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")))
      .select(col("doc_id"),
        concat_ws(", ", flagMap.map { case (name, _) =>
          when(col(name) === "Yes", name.replace('_', ' '))
        }: _*).as("features"))

  /** Flag distribution summary (normalize_parks_json.py:219-222):
    * melt the flag columns via an exploded map, then count by value.
    */
  def etlFlagSummary(s: SparkSession, d: String): DataFrame = {
    val mapArgs = flagMap.flatMap { case (name, _) => Seq(lit(name), col(name)) }
    withFlags(Tables.documents(s, d))
      .select(explode(map(mapArgs: _*)).as(Seq("flag", "value")))
      .groupBy(col("flag"), col("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("flag"), col("value"))
  }

  // ------------------------------------------------------------------
  // JSON flattening (normalize_parks_json.py:40-47).
  // ------------------------------------------------------------------

  /** Build a nested record from events (struct-in-struct, array, JSON
    * props field), then flatten with [[JsonFlatten]]: structs →
    * `parent.child` columns, arrays → comma-joined strings, JSON text →
    * typed column.
    */
  def etlFlattenJson(s: SparkSession, d: String): DataFrame = {
    // sort the raw columns first so the JSON parse + struct expansion
    // evaluate once, above the range exchange (not also in its
    // sampling pass — see curPiiRedact's Scaladoc).
    val nested = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .orderBy(col("event_id"))
      .select(
        col("event_id"),
        struct(
          struct(col("user_id").as("id"), col("event_type").as("type")).as("user"),
          array(col("event_id"), col("user_id")).as("ids"),
          get_json_object(col("props"), "$.k").cast("long").as("k")).as("payload"))
    JsonFlatten.flatten(nested)
  }

  // ------------------------------------------------------------------
  // Conversation QA extraction (extract_chat_qa_tsv.py:84-129).
  // ------------------------------------------------------------------

  /** Sessions = users; messages = that user's events in event order,
    * with a deterministic role mapping. Faithful semantics: drop a
    * leading assistant greeting, first user message is the question,
    * the contiguous assistant messages right after it concatenate into
    * the response; both empty when absent.
    *
    * Spark-first shape: one shuffle (groupBy user) into a sorted
    * array<struct>, then pure higher-order array functions — incl. a
    * take-while via `aggregate` with a (parts, stop) state struct.
    *
    * Scale note: collect_list is safe here because a chat session is
    * inherently bounded (tens of messages); for unbounded-per-key
    * payloads prefer the equivalent window-function formulation the
    * DuckDB oracle uses (rn/min/first-break), which never materializes
    * a per-key array.
    */
  def etlQaExtract(s: SparkSession, d: String): DataFrame =
    firstQa(Tables.events(s, d)
      .select(col("user_id"),
        struct(
          col("event_id"),
          when(col("event_type").isin("view", "error"), "assistant")
            .otherwise("user").as("role"),
          concat_ws("#", col("event_type"), col("event_id")).as("content")).as("m"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("m"))).as("msgs")))
      .select(col("user_id"), col("user_question"), col("assistant_response"))
      .orderBy(col("user_id"))

  /** The reference CLI's DEFAULT output mode
    * (extract_chat_qa_tsv.py:155, `not user_q and not assistant_resp`
    * → skip): a session is EXCLUDED from the TSV only when BOTH its
    * extracted question AND response are empty, unless
    * `--include-empty` is passed. One-side-empty sessions (a question
    * that never got an answer, or an orphaned assistant run) ARE
    * written. [[etlQaExtract]] is the include-empty behavior (every
    * session represented); this row is the reference default — the
    * same [[firstQa]] kernel with the both-empty filter, so both CLI
    * modes are representable. The filter is a map-side predicate on
    * the extracted columns (pushed below the final sort by Catalyst),
    * not a second extraction pass.
    */
  def etlQaExtractNonempty(s: SparkSession, d: String): DataFrame =
    etlQaExtract(s, d)
      .filter(col("user_question") =!= "" || col("assistant_response") =!= "")

  /** The first-QA extraction kernel shared by [[etlQaExtract]] and
    * [[etlPagedQa]]: expects a `msgs` column of
    * `array<struct<…, role, content>>` in conversation order; adds
    * `user_question` / `assistant_response` per the reference
    * semantics (leading assistant greeting dropped, first user
    * message is the question, the contiguous assistant run after it
    * concatenates — take-while via `aggregate` with a (parts, stop)
    * state struct; both empty when absent). Faithful to the
    * reference's join rule (extract_chat_qa_tsv.py:128): an
    * empty-content assistant message still CONTINUES the contiguous
    * run but contributes nothing to the joined response — the final
    * join filters empty parts. Drops the working columns.
    */
  private[graft] def firstQa(df: DataFrame): DataFrame =
    df
      .withColumn("msgs", expr(
        "CASE WHEN size(msgs) > 0 AND msgs[0].role = 'assistant' " +
          "THEN slice(msgs, 2, size(msgs)) ELSE msgs END"))
      .withColumn("fu", expr("array_position(transform(msgs, m -> m.role), 'user')"))
      .withColumn("user_question", expr(
        "CASE WHEN fu > 0 THEN msgs[cast(fu AS INT) - 1].content ELSE '' END"))
      .withColumn("assistant_response", expr(
        """aggregate(
          |  CASE WHEN fu > 0 THEN slice(msgs, cast(fu AS INT) + 1, size(msgs))
          |       ELSE slice(msgs, 1, 0) END,
          |  named_struct('parts', cast(array() AS array<string>), 'stop', false),
          |  (acc, m) -> CASE WHEN acc.stop OR m.role <> 'assistant'
          |    THEN named_struct('parts', acc.parts, 'stop', true)
          |    ELSE named_struct('parts', concat(acc.parts, array(m.content)), 'stop', false) END,
          |  acc -> array_join(filter(acc.parts, p -> p <> ''), ' '))""".stripMargin))
      .drop("msgs", "fu")

  /** Chats served by [[etlPagedQa]]'s stub API. */
  val PagedNumChats = 9

  /** QA extraction fed through the PAGINATED SOURCE — the reference
    * pipeline end-to-end (extract_chat_qa_tsv.py: page through the
    * chat directory, page through each chat's sessions, extract the
    * first QA pair per session): the bounded chat directory pages on
    * the driver, each chat's session stream pages inside the
    * distributed [[graft.sources.PagedSource.readPaged]] kernel
    * (small page sizes so BOTH loops genuinely take multiple pages),
    * records parse schema-on-read, and the [[firstQa]] kernel — the
    * same one [[etlQaExtract]] runs on the events table — produces
    * the QA columns. The stub's records are a pure function of
    * (chat, session), so the DuckDB oracle regenerates the expected
    * output in closed form — the full ingest→parse→extract path is
    * hash-gated.
    */
  def etlPagedQa(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val client = new graft.sources.PagedSource.StubPageClient(PagedNumChats)
    val chatIdRe = """"chat_id":"([^"]+)"""".r
    val chatIds = graft.sources.PagedSource
      .fetchAllPages(client, "chats", pageSize = 4)
      .flatMap(r => chatIdRe.findFirstMatchIn(r).map(_.group(1)))
    val schema = StructType(Seq(
      StructField("chat_id", StringType),
      StructField("session_id", StringType),
      StructField("messages", ArrayType(StructType(Seq(
        StructField("role", StringType),
        StructField("content", StringType)))))))
    val sessions = graft.sources.PagedSource.readPaged(
      s, chatIds.map(id => s"chats/$id/sessions"), client, schema, pageSize = 2)
    firstQa(sessions.withColumnRenamed("messages", "msgs"))
      .select(col("chat_id"), col("session_id"),
        col("user_question"), col("assistant_response"))
      .orderBy(col("chat_id"), col("session_id"))
  }

  /** safe_text (extract_chat_qa_tsv.py:34-40): tab/CR/LF → single
    * space, then trim. The query injects whitespace first so the
    * operator is actually exercised by clean source data.
    */
  def etlSanitizeText(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(lit("  "), col("text"), lit("\t"), col("source"), lit("\n")).as("raw"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), trim(translate(col("raw"), "\t\r\n", "   ")).as("clean"))

  // ------------------------------------------------------------------
  // Reference-chunk extraction (test_chat_assistant.py:159-196).
  // ------------------------------------------------------------------

  /** Nested chunk list per session → total + comma-joined id /
    * document-name / similarity columns, exactly the reference's
    * `extract_reference_info` output shape.
    */
  def etlRefChunks(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        struct(col("event_id"), col("event_type"),
          round(col("value"), 2).cast("string").as("sim")).as("c"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("c"))).as("chunks"))
      .select(
        col("user_id"),
        size(col("chunks")).cast("long").as("total_references"),
        array_join(expr("transform(chunks, c -> cast(c.event_id AS string))"), ", ").as("chunk_ids"),
        array_join(expr("transform(chunks, c -> c.event_type)"), ", ").as("document_names"),
        array_join(expr("transform(chunks, c -> c.sim)"), ", ").as("similarities"))
      .orderBy(col("user_id"))

  /** The reference's FULL three-channel chunk shape
    * (test_chat_assistant.py:163-176): every chunk carries
    * `similarity`, `vector_similarity` AND `term_similarity`, each
    * coerced through the reference's `str(chunk.get(k) or "")` — a
    * FALSY coercion, so a missing/None value AND a 0 value both
    * become the empty string (faithful to the `or`, not just the
    * docstring's "None values"), and empty entries keep their place
    * in the comma-joined list (the join preserves separators).
    * Nulls and zeros are injected deterministically per event so
    * every coercion branch is hash-gated: similarity is NULL on
    * event_id % 5, vector_similarity NULL on % 7, term_similarity
    * ZERO on % 9 (the falsy-zero case the docstring would miss).
    * The per-channel transforms run INSIDE the chunk struct before
    * the join, so a null never silently drops out of `array_join`
    * (which skips nulls — the coercion must happen first, exactly
    * like the reference coerces before `", ".join`).
    */
  def etlRefChunksMulti(s: SparkSession, d: String): DataFrame = {
    val e = col("event_id")
    def coerced(c: Column): Column =
      when(c.isNull || c === 0, lit("")).otherwise(c.cast("string"))
    // channel values derive by INTEGER multipliers: `value` is a
    // 2-decimal quantity, so ×2/×3 stay exactly 2-decimal and the
    // round is a no-op on both engines — a ÷2 would land half the
    // rows exactly on the .xx5 tie where Spark (HALF_UP over the
    // shortest decimal repr) and DuckDB (binary-value round) disagree
    val sim = coerced(when(e % 5 === 0, lit(null).cast("double"))
      .otherwise(round(col("value"), 2)))
    val vsim = coerced(when(e % 7 === 0, lit(null).cast("double"))
      .otherwise(round(col("value") * 2, 2)))
    val tsim = coerced(when(e % 9 === 0, lit(0.0))
      .otherwise(round(col("value") * 3, 2)))
    Tables.events(s, d)
      .select(col("user_id"),
        struct(col("event_id"), col("event_type"),
          sim.as("sim"), vsim.as("vsim"), tsim.as("tsim")).as("c"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("c"))).as("chunks"))
      .select(
        col("user_id"),
        size(col("chunks")).cast("long").as("total_references"),
        array_join(expr("transform(chunks, c -> cast(c.event_id AS string))"), ", ").as("chunk_ids"),
        array_join(expr("transform(chunks, c -> c.event_type)"), ", ").as("document_names"),
        array_join(expr("transform(chunks, c -> c.sim)"), ", ").as("similarities"),
        array_join(expr("transform(chunks, c -> c.vsim)"), ", ").as("vector_similarities"),
        array_join(expr("transform(chunks, c -> c.tsim)"), ", ").as("term_similarities"))
      .orderBy(col("user_id"))
  }

  /** Per-(answer, session, reference-node) SSE parse for the composed
    * chat-session flow — the [[parseSseTranscript]] loop with the
    * reference node kept as parsed JSON (the chunk extraction needs
    * its structure, not just the total). Last-wins per field, same
    * validity rules.
    */
  private[graft] def parseSseFull(transcript: String)
      : (String, String, com.fasterxml.jackson.databind.JsonNode) = {
    var answer: String = null
    var session: String = null
    var ref: com.fasterxml.jackson.databind.JsonNode = null
    transcript.split("\n", -1).foreach { line =>
      if (line.startsWith("data:")) {
        val payload = line.substring(5).trim
        if (payload.nonEmpty && payload != "[DONE]" &&
            payload != "null" && payload != "None") {
          try {
            val node = sseMapper.readTree(payload)
            if (node != null && node.path("code").asText() == "0" &&
                node.hasNonNull("data")) {
              val data = node.get("data")
              if (data.hasNonNull("answer")) answer = data.get("answer").asText()
              if (data.hasNonNull("session_id")) session = data.get("session_id").asText()
              if (data.hasNonNull("reference")) ref = data.get("reference")
            }
          } catch { case _: com.fasterxml.jackson.core.JacksonException => () }
        }
      }
    }
    (answer, session, ref)
  }

  /** The COMPOSED chat-session flow of the reference's main loop
    * (test_chat_assistant.py:84-101 create_session, 107-131
    * ask_question, 215-280 the per-question loop): per question,
    * CREATE a session (an empty-question SSE call whose stream
    * carries the session id), and when creation fails write the
    * reference's DEGRADED row — empty answer/session, the creation
    * status code, zero references, empty chunk columns — instead of
    * dropping the question or failing the job; otherwise ASK in the
    * session, SSE-parse the reply, and extract the full three-channel
    * reference info ([[etlRefChunksMulti]]'s `str(x or "")` falsy
    * coercion per chunk field, `total` falling back to the chunk
    * count when the server omits it — `.get("total", len(chunks))`).
    *
    * Failure injection (the etl_model_judge discipline — the degraded
    * paths are themselves hash-gated): every 11th question's creation
    * call fails (HTTP 500, no session in the stream); every 13th ask
    * returns an empty stream (no answer, no reference — the row keeps
    * its session and 200 but reports zero references); every 5th
    * chunk similarity is null and every 9th term similarity is 0 (the
    * falsy-zero case); every 3rd reply omits `total`.
    *
    * Scale shape: the [[etlSseParse]] kernel discipline — one
    * map-side typed pass over range-placed rows, Jackson only on
    * `data:` payloads, no Generate, no exchange after the kernel.
    */
  def etlChatSessions(s: SparkSession, d: String): DataFrame = {
    val e = col("event_id")
    val s1 = round(col("value"), 2)
    val v1 = round(col("value") * 2, 2)
    val t1 = round(col("value") * 3, 2)
    def js(c: Column): Column = c.cast("string")
    val simFrag = when(e % 5 === 0, lit(""""similarity":null"""))
      .otherwise(concat(lit(""""similarity":"""), js(s1)))
    val termFrag = when(e % 9 === 0, lit(""""term_similarity":0.0"""))
      .otherwise(concat(lit(""""term_similarity":"""), js(t1)))
    val chunk1 = concat(
      lit("""{"id":"c-"""), js(e), lit("""-1","document_name":"doc-"""), js(e % 7),
      lit("\","), simFrag,
      lit(""","vector_similarity":"""), js(v1), lit(","), termFrag, lit("}"))
    val chunk2 = concat(
      lit("""{"id":"c-"""), js(e), lit("""-2","document_name":"doc-"""), js(e % 7),
      lit("""","similarity":"""), js(s1 + 1),
      lit(""","vector_similarity":"""), js(v1 + 1),
      lit(""","term_similarity":"""), js(t1 + 1), lit("}"))
    val totalFrag = when(e % 3 === 0, lit("")).otherwise(lit(""""total":3,"""))
    val createStatus = when(e % 11 === 0, lit(500)).otherwise(lit(200))
    val createRaw = when(e % 11 === 0,
        lit("data: {\"code\": 1, \"message\": \"boom\"}\ndata: [DONE]"))
      .otherwise(concat(
        lit("""data: {"code": 0, "data": {"answer": "greetings", "session_id": "sess-"""),
        col("user_id").cast("string"), lit("-"), js(e), lit("\"}}\ndata: [DONE]")))
    val askRaw = when(e % 13 === 0, lit("data: [DONE]"))
      .otherwise(concat(
        lit("event: message\ndata: {\"code\": 0, \"data\": {\"answer\": \"partial "), js(e),
        lit("\"}}\ndata: {\"code\": 0, \"data\": {\"answer\": \"final "), js(e),
        lit("""", "reference": {"""), totalFrag,
        lit(""""chunks": ["""), chunk1, lit(","), chunk2,
        lit("]}}}\ndata: [DONE]")))
    val nPart = s.sessionState.conf.numShufflePartitions
    val base = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartitionByRange(nPart, col("event_id"))
      .select(col("event_id"), createStatus.as("create_status"),
        createRaw.as("create_raw"), askRaw.as("ask_raw"))
    import s.implicits._
    base.as[(Long, Int, String, String)]
      .mapPartitions(_.map { case (id, cStatus, cRaw, aRaw) =>
        val q = s"q-$id"
        val (_, session, _) = parseSseFull(cRaw)
        if (session == null) {
          // the reference's degraded row: creation failed
          (id, q, "", cStatus.toLong, "", 0L, "", "", "", "", "")
        } else {
          val (answer, _, ref) = parseSseFull(aRaw)
          val chunks =
            if (ref != null && ref.has("chunks") && ref.get("chunks").isArray)
              (0 until ref.get("chunks").size).map(ref.get("chunks").get)
            else Seq.empty
          val total =
            if (ref != null && ref.hasNonNull("total")) ref.get("total").asLong
            else chunks.size.toLong
          // str(chunk.get(k) or ""): falsy coercion; integral JSON
          // nodes keep their integer text (Python str(3) = "3"),
          // doubles render shortest-repr (= DuckDB's VARCHAR cast)
          def coerce(c: com.fasterxml.jackson.databind.JsonNode,
              k: String): String = {
            val n = if (c.hasNonNull(k)) c.get(k) else null
            if (n == null) ""
            else if (n.isNumber) {
              val v = n.asDouble
              if (v == 0.0) "" else if (n.isIntegralNumber) n.asText
              else v.toString
            } else { val t = n.asText; if (t.isEmpty) "" else t }
          }
          def joined(k: String) = chunks.map(coerce(_, k)).mkString(", ")
          (id, q, if (answer == null) "" else answer, 200L, session, total,
            joined("id"), joined("document_name"), joined("similarity"),
            joined("vector_similarity"), joined("term_similarity"))
        }
      })
      .toDF("event_id", "question", "answer", "status_code", "session_id",
        "total_references", "chunk_ids", "document_names", "similarities",
        "vector_similarities", "term_similarities")
      .sortWithinPartitions(col("event_id"))
  }

  /** Judge-JSON extraction (test_chat_assistant_with_judge.py:292-358):
    * take the first `{...}` block of a noisy raw text (find "{" →
    * rfind "}" ⇒ greedy regex), then parse a typed field out of it.
    */
  def etlJudgeJsonParse(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        concat(lit("judge says: "), col("props"), lit(" -- end")).as("raw"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        regexp_extract(col("raw"), "\\{.*\\}", 0).as("judge_json"))
      .select(col("event_id"), col("judge_json"),
        get_json_object(col("judge_json"), "$.k").cast("long").as("k"))

  // ------------------------------------------------------------------
  // Judge response-envelope parse chain + composed judge pipeline
  // (test_chat_assistant_with_judge.py:292-358 and 509-535).
  // ------------------------------------------------------------------

  /** The reference's full `parse_judge_output` chain
    * (test_chat_assistant_with_judge.py:303-358), not just its final
    * fallback: a judge reply may arrive wrapped in any of the standard
    * API envelopes, tried in the reference's exact order —
    *
    *  1. parse the whole body as JSON; if it is an object:
    *     Messages-API `content[0].text` → `completion` → `output` →
    *     `choices[0].text` / `choices[0].message` → (if the object
    *     already carries `labels`/`scores`, it IS the judge JSON) —
    *     the winning candidate is parsed as JSON itself, or on parse
    *     failure becomes the raw text for step 2; an object matching
    *     no envelope is re-serialized and falls to step 2;
    *  2. first `{`…last `}` block of the remaining raw text, parsed;
    *  3. otherwise a parse error.
    *
    * Returns (parsedNode or null, parseError or null). JSON text is
    * canonicalized as Jackson's compact serialization (the engine's
    * convention for emitted JSON-in-a-column values; the reference
    * uses `json.dumps`, whose spacing is a formatting detail, not a
    * semantic one).
    */
  private[graft] def parseJudgeOutput(
      rawText: String): (com.fasterxml.jackson.databind.JsonNode, String) = {
    import com.fasterxml.jackson.databind.JsonNode
    if (rawText == null || rawText.isEmpty) return (null, "empty judge response")
    def tryParse(s: String): JsonNode =
      try sseMapper.readTree(s)
      catch { case _: com.fasterxml.jackson.core.JacksonException => null }
    // a candidate node that is itself a JSON-encoded string decodes to
    // its text; any other node re-serializes (the reference hands the
    // raw python value to json.loads / the find-brace fallback)
    def nodeText(n: JsonNode): String = if (n.isTextual) n.asText() else n.toString
    var remaining = rawText
    val top = tryParse(rawText)
    if (top != null && top.isObject) {
      val candidate: String =
        if (top.has("content") && top.get("content").isArray && top.get("content").size > 0) {
          val first = top.get("content").get(0)
          if (first.isObject && first.hasNonNull("text")) first.get("text").asText() else null
        } else if (top.hasNonNull("completion")) nodeText(top.get("completion"))
        else if (top.hasNonNull("output")) nodeText(top.get("output"))
        else if (top.has("choices") && top.get("choices").isArray && top.get("choices").size > 0) {
          val c0 = top.get("choices").get(0)
          if (c0.isObject && c0.hasNonNull("text")) nodeText(c0.get("text"))
          else if (c0.isObject && c0.hasNonNull("message")) nodeText(c0.get("message"))
          else nodeText(c0)
        } else if (top.has("labels") || top.has("scores")) {
          return (top, null)
        } else null
      if (candidate != null) {
        val parsed = tryParse(candidate)
        if (parsed != null) return (parsed, null)
        remaining = candidate
      } else remaining = top.toString
    }
    val start = remaining.indexOf('{')
    val end = remaining.lastIndexOf('}')
    if (start >= 0 && end > start) {
      val snippet = remaining.substring(start, end + 1)
      val parsed = tryParse(snippet)
      if (parsed != null) return (parsed, null)
      return (null, s"failed to parse inner JSON; snippet len ${snippet.length}")
    }
    (null, "unable to parse judge JSON")
  }

  /** The reference's `calculate_quality_color` ladder
    * (test_chat_assistant_with_judge.py:380-422) evaluated over a
    * PARSED labels object with python-dict `.get(key, default)`
    * semantics — missing keys take the reference's per-rule default
    * (note `answer_present`/`retrieval_supports_answer`/
    * `retrieval_complete`/`retrieval_relevant` default TRUE for their
    * negated RED/YELLOW rules but FALSE for the positive GREEN/YELLOW
    * rules, exactly as in the reference).
    */
  private[graft] def qualityColorOf(
      labels: com.fasterxml.jackson.databind.JsonNode): String = {
    def get(k: String, dflt: Boolean): Boolean =
      if (labels != null && labels.hasNonNull(k)) labels.get(k).asBoolean(dflt) else dflt
    if (labels == null || !labels.isObject || labels.isEmpty) "GRAY"
    else if (get("answer_wrong", false)) "RED"
    else if (get("answer_hallucination", false)) "RED"
    else if (get("answer_contradicts_sources", false)) "RED"
    else if (!get("answer_present", true)) "RED"
    else if (!get("retrieval_supports_answer", true)) "RED"
    else if (get("answer_partial", false)) "YELLOW"
    else if (!get("retrieval_complete", true)) "YELLOW"
    else if (!get("retrieval_relevant", true)) "YELLOW"
    else if (get("source_divergence", false)) "YELLOW"
    else if (get("answer_requires_followup", false)) "YELLOW"
    else if (get("answer_direct", false) && get("retrieval_supports_answer", false)) "GREEN"
    else if (get("answer_present", false)) "YELLOW"
    else "GRAY"
  }

  /** The composed judge pipeline row
    * (test_chat_assistant_with_judge.py:509-535): envelope-parse the
    * raw judge reply with the FULL [[parseJudgeOutput]] chain, then
    * emit the CSV row's judge fields — `judge_json` (the parsed
    * object, canonical text), `judge_labels` / `judge_scores` (the
    * `labels` / `scores` sub-objects, `{}` when absent, as the
    * reference's `.get(k, {})` + `json.dumps`), `judge_notes`, and
    * `quality_color` computed from the PARSED labels via
    * [[qualityColorOf]]; a reply that defeats the whole chain emits
    * the reference's failure row — empty judge fields, the parse
    * error in `judge_notes`, `quality_color` GRAY.
    *
    * Envelope variety is injected deterministically per event (the
    * etl_model_judge failure-injection discipline) so every branch of
    * the chain is hash-gated: event_id mod 6 selects Messages-API
    * `content[0].text` / `completion` / `output` / `choices[0].text`
    * / bare judge object / noisy-text-with-a-brace-block, and every
    * 13th event's reply is unparseable garbage exercising the failure
    * row. The DuckDB oracle replays the expected output in CLOSED
    * FORM from event_id (the etl_paged_qa discipline) — independent
    * of the engine's parse, so a mishandled envelope corrupts 1/6 of
    * rows and fails the hash.
    *
    * Scale shape: one map-side typed kernel pass (the [[etlSseParse]]
    * discipline — Jackson only runs on surviving rows, nothing is
    * addressed by position), range-placed before the kernel so the
    * final order is a map-side sortWithinPartitions; no shuffle of
    * parsed rows, no Generate, no aggregate.
    */
  def etlJudgePipeline(s: SparkSession, d: String): DataFrame = {
    val e = col("event_id")
    // the judge's own JSON, minified in the engine's canonical form
    val labelsJson = concat(
      lit("""{"answer_present":"""), when(e % 11 === 1, "false").otherwise("true"),
      lit(""","answer_direct":"""), when(e % 2 === 0, "true").otherwise("false"),
      lit(""","answer_wrong":"""), when(e % 7 === 0, "true").otherwise("false"),
      lit(""","answer_partial":"""), when(e % 5 === 0, "true").otherwise("false"),
      lit(""","retrieval_supports_answer":"""), when(e % 3 === 0, "false").otherwise("true"),
      lit(""","retrieval_complete":"""), when(e % 4 === 0, "false").otherwise("true"),
      lit("}"))
    val inner = concat(
      lit("""{"labels":"""), labelsJson,
      lit(""","scores":{"overall":"""), (e % 10).cast("string"),
      lit("""},"notes":"note """), e.cast("string"), lit("\"}"))
    // the inner JSON re-encoded as a JSON string literal for embedding
    // inside an envelope's text field
    val innerEsc = concat(lit("\""), regexp_replace(inner, "\"", "\\\\\""), lit("\""))
    val raw =
      when(e % 13 === 0, lit("judge failed: no structured output"))
        .when(e % 6 === 0, concat(
          lit("""{"id":"msg_"""), e.cast("string"),
          lit("""","model":"judge-m","content":[{"type":"text","text":"""),
          innerEsc, lit("}]}")))
        .when(e % 6 === 1, concat(lit("""{"completion":"""), innerEsc, lit("}")))
        .when(e % 6 === 2, concat(lit("""{"output":"""), innerEsc, lit("}")))
        .when(e % 6 === 3, concat(
          lit("""{"choices":[{"text":"""), innerEsc, lit("}]}")))
        .when(e % 6 === 4, inner)
        .otherwise(concat(lit("judge says: "), inner, lit(" -- end")))
    val nPart = s.sessionState.conf.numShufflePartitions
    val base = Tables.events(s, d)
      .select(col("event_id"))
      .repartitionByRange(nPart, col("event_id"))
      .select(col("event_id"), raw.as("raw"))
    import s.implicits._
    base.as[(Long, String)]
      .mapPartitions(_.map { case (id, rawText) =>
        val (parsed, err) = parseJudgeOutput(rawText)
        if (parsed != null && parsed.isObject) {
          val labels = parsed.get("labels")
          val scores = parsed.get("scores")
          val notes =
            if (parsed.hasNonNull("notes")) parsed.get("notes").asText("") else ""
          (id, parsed.toString,
            if (labels != null && labels.isObject) labels.toString else "{}",
            if (scores != null && scores.isObject) scores.toString else "{}",
            notes, qualityColorOf(labels))
        } else if (parsed != null) {
          // parsed but not an object: the reference serializes it and
          // leaves every other judge field at its GRAY default
          (id, parsed.toString, "", "", "", "GRAY")
        } else {
          (id, "", "", "", if (err == null) "" else err, "GRAY")
        }
      })
      .toDF("event_id", "judge_json", "judge_labels", "judge_scores",
        "judge_notes", "quality_color")
      .sortWithinPartitions(col("event_id"))
  }

  // ------------------------------------------------------------------
  // Quality-color cascade (test_chat_assistant_with_judge.py:380-422).
  // ------------------------------------------------------------------

  /** Deterministic label derivation over documents, then the exact
    * RED → YELLOW → GREEN → GRAY rule ladder of the reference.
    */
  def etlQualityColor(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val present = col("n_chars") > 50
    val direct = t.like("%fast%")
    val partial = t.like("%slow%")
    val wrong = t.like("%dup%") && partial
    val halluc = t.like("%vector%") && !t.like("%table%")
    val contradicts = t.like("%merge%") && t.like("%window%")
    val supports = t.like("%table%")
    val complete = t.like("%query%")
    val relevant = t.like("%data%") || t.like("%row%")
    val divergence = t.like("%batch%") && t.like("%stream%")
    val followup = t.like("%customer%")
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(wrong, "RED")
          .when(halluc, "RED")
          .when(contradicts, "RED")
          .when(!present, "RED")
          .when(!supports, "RED")
          .when(partial, "YELLOW")
          .when(!complete, "YELLOW")
          .when(!relevant, "YELLOW")
          .when(divergence, "YELLOW")
          .when(followup, "YELLOW")
          .when(direct && supports, "GREEN")
          .when(present, "YELLOW")
          .otherwise("GRAY").as("quality_color"))
      .orderBy(col("doc_id"))
  }

  /** Record → natural-language summary (convert_json_to_text.py:27-52).
    * The reference calls an external LLM per JSON file; the engine
    * renders the same record→prose transform as a deterministic
    * template so it is distributed, reproducible and oracle-checkable.
    * A real model call would slot in behind the same column contract.
    */
  def etlJsonToText(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("c_name"),
        col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      // template rendering above the sort: evaluated once, not also by
      // the range exchange's sampling pass (see curPiiRedact).
      .select(col("o_orderkey"),
        concat(
          lit("Order "), col("o_orderkey"),
          lit(" was placed on "), date_format(col("o_orderdate"), "yyyy-MM-dd"),
          lit(" by "), col("c_name"),
          lit(" with priority "), col("o_orderpriority"),
          lit(" for a total of "), round(col("o_totalprice"), 2).cast("string"),
          lit(".")).as("summary"))
  }

  // ------------------------------------------------------------------
  // SSE stream-record parsing (test_chat_assistant.py:36-103).
  // ------------------------------------------------------------------

  /** Parse a server-sent-events transcript column: keep `data:` lines,
    * drop sentinels ([DONE]/null/None), drop error records
    * (code != 0) and non-object payloads, then last-wins extraction of
    * answer / session_id / reference total — exactly the reference's
    * streaming-chunk overwrite semantics, as one typed per-line
    * kernel pass. The transcript is synthesized per event (with and without
    * a reference block, plus noise + sentinel lines) so every branch
    * is exercised.
    */
  /** Shared JSON reader for the SSE kernel: ObjectMapper.readTree is
    * thread-safe once configured, so executor threads share one.
    */
  private val sseMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The generic per-transcript SSE parse (the reference's per-line
    * loop, test_chat_assistant.py:36-103): keep `data:` payloads,
    * skip sentinels ([DONE]/null/None/empty) and unparsable JSON,
    * accept only code == 0 records carrying a data payload, and let
    * each later valid chunk's non-null fields overwrite earlier ones.
    * Works for any line count, ordering, or chunk mix — nothing is
    * addressed by position (exercised on adversarial layouts in
    * ReferencePipelinesSpec). Returns (answer, session_id,
    * total_references) with the reference's defaults.
    */
  private[graft] def parseSseTranscript(transcript: String): (String, String, Long) = {
    var answer: String = null
    var session: String = null
    var total: java.lang.Long = null
    transcript.split("\n", -1).foreach { line =>
      if (line.startsWith("data:")) {
        val payload = line.substring(5).trim
        if (payload.nonEmpty && payload != "[DONE]" &&
            payload != "null" && payload != "None") {
          try {
            val node = sseMapper.readTree(payload)
            // validity: code == 0 (string-compared like the oracle's
            // json_extract_string) and a data payload
            if (node != null && node.path("code").asText() == "0" &&
                node.hasNonNull("data")) {
              val data = node.get("data")
              if (data.hasNonNull("answer")) answer = data.get("answer").asText()
              if (data.hasNonNull("session_id")) session = data.get("session_id").asText()
              val ref = data.path("reference")
              if (ref.hasNonNull("total")) total = ref.get("total").asLong()
            }
          } catch { case _: com.fasterxml.jackson.core.JacksonException => () }
        }
      }
    }
    (if (answer == null) "" else answer,
      if (session == null) "" else session,
      if (total == null) 0L else total.longValue())
  }

  def etlSseParse(s: SparkSession, d: String): DataFrame = {
    val line1 = concat(lit("""data: {"code": 0, "data": {"answer": "partial """),
      col("event_id"), lit(""""}}"""))
    // regexp_extract, not get_json_object: the latter is
    // CodegenFallback, and any fallback expression in posexplode's
    // child gets re-evaluated per exploded output row (6x here).
    val line2 = when(col("event_id") % 2 === 0,
      concat(lit("""data: {"code": 0, "data": {"answer": "final """), col("event_id"),
        lit("""", "session_id": "sess-"""), col("user_id"),
        lit("""", "reference": {"total": """),
        regexp_extract(col("props"), ":\\s*(\\d+)", 1), lit("}}}")))
      .otherwise(concat(lit("""data: {"code": 0, "data": {"answer": "final """),
        col("event_id"), lit("""", "session_id": "sess-"""), col("user_id"), lit(""""}}""")))
    val raw = concat_ws("\n",
      lit("event: message"), line1,
      lit("""data: {"code": 1, "message": "transient error"}"""),
      line2, lit("data: [DONE]"))
    // ONE range exchange, placed BEFORE the kernel: the source is a
    // single parquet split locally, so some explicit repartition is
    // needed for parse parallelism anyway (a bare repartition(col)
    // gets AQE-coalesced back to ~1 partition at this size; a
    // user-specified count is exempt). Making that exchange a RANGE
    // partition on the final sort key means the kernel's output is
    // already globally range-placed — the query ends with a map-side
    // sortWithinPartitions instead of a second (sampling + exchange)
    // orderBy over the parsed rows, and the localCheckpoint barrier
    // the old plan needed (so the orderBy's sampling pass wouldn't
    // re-run the kernel) disappears with the pass it guarded. The
    // range sampler only re-scans the cheap 3-column parquet input,
    // never the Jackson kernel.
    val nPart = s.sessionState.conf.numShufflePartitions
    val base = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("props"))
      .repartitionByRange(nPart, col("event_id"))
      .select(col("event_id"), raw.as("raw"))
    // GENERIC per-line parse as a typed kernel — the reference's own
    // loop shape (test_chat_assistant.py:36-103: iterate lines, keep
    // `data:` payloads, skip sentinels/invalid JSON/error records,
    // later chunks' non-null fields overwrite earlier ones). A
    // transcript with any line count, ordering, or number of valid
    // chunks parses correctly — nothing is addressed by position.
    // The kernel replaces an earlier element_at(lines, 2/4) static
    // form that exploited the 5-line synthesis layout (fast but not
    // an SSE parser) AND the explode + from_json + groupBy form that
    // preceded it (generic but pays a Generate, per-line Jackson
    // calls through CodegenFallback, and a full shuffle of the line
    // rows — measured ~4s at sf0.1). One map-side pass, no Generate,
    // no exchange, no aggregate; Jackson parses only surviving
    // `data:` payloads.
    import s.implicits._
    base.as[(Long, String)]
      .mapPartitions(_.map { case (id, transcript) =>
        val (answer, session, total) = parseSseTranscript(transcript)
        (id, answer, session, total)
      })
      .toDF("event_id", "answer", "session_id", "total_references")
      // Range placement happened upstream of the kernel, so a
      // map-side sort completes the same global order orderBy gave:
      // partitions are range-disjoint and ascending by construction.
      .sortWithinPartitions(col("event_id"))
  }

  /** The reference's record-summarization model call
    * (convert_json_to_text.py:120) routed through the explicit
    * [[graft.functions.ModelHook]] seam: a batched `mapPartitions`
    * model stage over per-document prompts. The deterministic
    * StubClient (md5-tagged echo) stands in for the live LLM, which
    * makes the WHOLE model stage oracle-checkable — DuckDB reproduces
    * the stub byte-for-byte, so the driver's hash gate covers the
    * batching kernel, not just a spec.
    */
  def etlModelSummarize(s: SparkSession, d: String): DataFrame =
    etlModelSummarize(s, d, minGapMs = 0L)

  /** CLI flavor: `minGapMs` is the reference's `--delay` inter-call
    * pacing ([[graft.functions.ModelHook.completions]]'s knob); the
    * output is identical at any setting — pacing must never change
    * results, only aggregate QPS. */
  def etlModelSummarize(s: SparkSession, d: String, minGapMs: Long): DataFrame = {
    val prompts = Tables.documents(s, d)
      .select(col("doc_id"), concat(lit("summarize: "), col("text")).as("prompt"))
    graft.functions.ModelHook.completions(
        s, prompts, "doc_id", "prompt",
        new graft.functions.ModelHook.StubClient("summary"),
        minGapMs = minGapMs)
      // lazy checkpoint before the sort: the range exchange's sampling
      // pass would otherwise re-run the model stage — twice the model
      // calls, which against a live endpoint is twice the cost/rate
      // limit, not just twice the CPU. Lazy (eager = false) so merely
      // CONSTRUCTING or explaining the query fires zero model calls.
      .localCheckpoint(eager = false)
      .orderBy(col("doc_id"))
  }

  /** The reference's judge loop routed through [[graft.functions
    * .ModelHook]] WITH deterministic failure injection
    * ([[graft.functions.ModelHook.FlakyStubClient]]: prompts whose
    * md5 starts with '0' — ~1/16 of documents — raise a 503). What
    * the driver's hash gate covers here is the CONTINUE-ON-ERROR
    * machinery end-to-end: nearly every 32-prompt batch contains a
    * failing prompt, so the batch call fails, degrades to per-row
    * adjudication, and emits (null, 503, err) rows for exactly the
    * failing documents while every healthy row still completes —
    * byte-reproduced by the DuckDB oracle because failure is a pure
    * function of the prompt. Mirrors
    * test_chat_assistant_with_judge.py:361-377's per-row
    * `judge-http-<status>` rows.
    */
  def etlModelJudge(s: SparkSession, d: String): DataFrame =
    etlModelJudge(s, d, minGapMs = 0L)

  /** CLI flavor: `minGapMs` = the reference judge loop's
    * `--judge-delay` pacing; retries are paced too (the throttle
    * wraps the client under the retry machinery). */
  def etlModelJudge(s: SparkSession, d: String, minGapMs: Long): DataFrame = {
    val prompts = Tables.documents(s, d)
      .select(col("doc_id"), concat(lit("judge: "), col("text")).as("prompt"))
    graft.functions.ModelHook.completions(
        s, prompts, "doc_id", "prompt",
        new graft.functions.ModelHook.FlakyStubClient("judge", "0"),
        maxRetries = 1, minGapMs = minGapMs)
      // lazy checkpoint before the sort — same reasoning as
      // etlModelSummarize (the sampling pass must not re-fire the
      // model stage)
      .localCheckpoint(eager = false)
      .orderBy(col("doc_id"))
  }

  /** Dead-letter routing for schema-on-read ingestion: every record
    * either parses into the typed columns or lands in the DLQ with a
    * reason — never a dropped row, never a failed job (the
    * badRecordsPath/PERMISSIVE contract every production ingest
    * needs). Corruption is injected deterministically (every 7th
    * record loses its closing brace) so the routing itself is
    * hash-gated; the parse-or-null probe is `get_json_object` (pure
    * map-side, one pass). At 100 TB this is a scan-shaped kernel with
    * no shuffle at all — the DLQ split is a predicate, not a job.
    */
  def etlDlqRoute(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        when(pmod(col("event_id"), lit(7)) === 0,
          expr("substring(props, 1, length(props) - 1)"))
          .otherwise(col("props")).as("raw"))
      .withColumn("k", get_json_object(col("raw"), "$.k").cast("long"))
      .select(col("event_id"),
        when(col("k").isNotNull, lit("ok")).otherwise(lit("dlq")).as("status"),
        col("k"),
        when(col("k").isNull, lit("unparseable_json"))
          .otherwise(lit(null).cast("string")).as("err"),
        when(col("k").isNull, col("raw"))
          .otherwise(lit(null).cast("string")).as("dlq_payload"))
      .orderBy(col("event_id"))

  /** The fixed evaluator template of the reference's
    * `build_judge_prompt` (test_chat_assistant_with_judge.py:218-249)
    * up through the QUESTION: header — the interpolation points
    * (question, answer, chunk count, chunk JSON, session id) follow as
    * column work in [[etlJudgePrompt]].
    */
  private[graft] val JudgePromptHead: String =
    """You are an evaluator that must judge whether an assistant answer correctly responds to a user's question,
and whether the retrieved reference chunks support the answer.

Return ONLY a single valid JSON object (no surrounding text) with fields:
- labels: dict of boolean flags (answer_present, answer_direct, answer_partial, answer_wrong,
  answer_hallucination, answer_contradicts_sources, retrieval_relevant, retrieval_supports_answer,
  retrieval_complete, source_divergence, citation_ok, answer_safe, answer_requires_followup)
- scores: dict with numeric scores between 0 and 1 for answer_quality, retrieval_relevance, evidence_support
- notes: short string explanation if any problem detected (<= 200 chars)

Rules:
- answer_present: true when assistant produced a non-empty answer.
- retrieval_relevant: true if the majority of provided chunks are topically relevant to the question.
- retrieval_supports_answer: true if chunks contain explicit facts that substantiate key claims in the assistant's answer.
- answer_hallucination: true if the assistant asserts facts not present in any provided chunk.
- answer_contradicts_sources: true if assistant's claims directly contradict one or more chunks.
- If unsure, prefer conservative (i.e., set problematic flags true).

Now evaluate the following input. Keep the JSON compact.

QUESTION:
"""

  /** The judge-prompt BUILD of the reference
    * (test_chat_assistant_with_judge.py:199-253): cap the session's
    * retrieved chunks at the first 12 ("limit to first 12 chunks to
    * avoid huge prompts"), project each to the four judged fields
    * (id, document_name, similarity, content), JSON-serialize the
    * projected list, and interpolate question / answer / chunk count
    * / chunk JSON / session id into the fixed evaluator template.
    * Pure column work — sort_array + slice + transform + to_json +
    * concat — so at 100 TB this is one groupBy exchange plus string
    * assembly. The chunk strings are built AFTER the slice (round
    * 14): the exchange carries only (event_id, similarity) structs
    * and the "c-…"/"doc-…"/"chunk text …" concats run on ≤12 rows
    * per session instead of every event — the shuffle-key discipline
    * applied to payload strings (same-process min-of-3 at 10x:
    * 1.27 s vs 2.41 s for the build-then-shuffle form; identical at
    * sf0.1 where the row is dispatch-floor-bound; the post-slice
    * transform lambda is interpreted, but over session-capped rows
    * that loses to the 4x shuffle-byte cut). The gate hashes
    * md5(prompt) per session, so a single byte of template,
    * serialization, or slice drift fails the row. Null similarities are injected on
    * event_id % 5: the reference's `c.get("similarity")` passes None
    * through json.dumps as a JSON null, so the engine serializes with
    * ignoreNullFields=false to keep the key (Spark's default would
    * silently drop it).
    */
  def etlJudgePrompt(s: SparkSession, d: String): DataFrame = {
    val e = col("event_id")
    val sim = when(e % 5 === 0, lit(null).cast("double"))
      .otherwise(round(col("value"), 2))
    val per = Tables.events(s, d)
      .select(col("user_id"),
        struct(e.as("event_id"), sim.as("similarity")).as("c"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(col("user_id"),
        expr("transform(slice(cs, 1, 12), c -> struct(" +
          "concat('c-', CAST(c.event_id AS STRING)) AS id, " +
          "concat('doc-', CAST(c.event_id % 7 AS STRING)) AS document_name, " +
          "c.similarity AS similarity, " +
          "concat('chunk text ', CAST(c.event_id AS STRING)) AS content))").as("chunks"))
    val u = col("user_id").cast("string")
    val chunksJson = to_json(col("chunks"), Map("ignoreNullFields" -> "false"))
    val prompt = concat(
      lit(JudgePromptHead),
      lit("q-"), u,
      lit("\n\nASSISTANT_ANSWER:\nanswer for q-"), u,
      lit("\n\nREFERENCES (first "), size(col("chunks")).cast("string"),
      lit(" chunks shown):\n"), chunksJson,
      lit("\n\nSESSION_ID:\nsess-"), u)
    per.select(col("user_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        length(prompt).cast("long").as("prompt_len"),
        md5(prompt).as("prompt_md5"))
      .orderBy(col("user_id"))
  }


  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_judge_prompt" -> etlJudgePrompt _,
    "etl_dlq_route" -> etlDlqRoute _,
    "etl_model_summarize" -> etlModelSummarize _,
    "etl_model_judge" -> etlModelJudge _,
    "etl_sse_parse" -> etlSseParse _,
    "etl_flatten_json" -> etlFlattenJson _,
    "etl_tristate_flags" -> etlTristateFlags _,
    "etl_other_text" -> etlOtherText _,
    "etl_active_features" -> etlActiveFeatures _,
    "etl_flag_summary" -> etlFlagSummary _,
    "etl_qa_extract" -> etlQaExtract _,
    "etl_qa_extract_nonempty" -> etlQaExtractNonempty _,
    "etl_paged_qa" -> etlPagedQa _,
    "etl_sanitize_text" -> etlSanitizeText _,
    "etl_ref_chunks" -> etlRefChunks _,
    "etl_ref_chunks_multi" -> etlRefChunksMulti _,
    "etl_chat_sessions" -> etlChatSessions _,
    "etl_judge_json_parse" -> etlJudgeJsonParse _,
    "etl_judge_pipeline" -> etlJudgePipeline _,
    "etl_quality_color" -> etlQualityColor _,
    "etl_json_to_text" -> etlJsonToText _)

  private val flagCaseSql: Map[String, String] = Map(
    "has_dup" -> raw"""CASE WHEN regexp_matches(lower(text), '\b(?:dup|dups)\b') THEN 'Yes'
       WHEN regexp_matches(lower(text), '\bno\s+(?:dup|dups)\b') THEN 'No'
       ELSE 'Don''t Know' END""",
    "is_slow" -> raw"""CASE WHEN regexp_matches(lower(text), '\b(?:slow)\b') THEN 'Yes'
       WHEN regexp_matches(lower(text), '\bno\s+(?:slow)\b') THEN 'No'
       ELSE 'Don''t Know' END""",
    "has_vector" -> raw"""CASE WHEN regexp_matches(lower(text), '\b(?:vector|vectors)\b') THEN 'Yes'
       WHEN regexp_matches(lower(text), '\bno\s+(?:vector|vectors)\b') THEN 'No'
       ELSE 'Don''t Know' END""",
    "has_stream" -> raw"""CASE WHEN regexp_matches(lower(text), '\b(?:stream|streaming)\b') THEN 'Yes'
       WHEN regexp_matches(lower(text), '\bno\s+(?:stream|streaming)\b') THEN 'No'
       ELSE 'Don''t Know' END""")

  private val flagsCte =
    s"""WITH f AS (SELECT doc_id,
       | ${flagCaseSql("has_dup")} AS has_dup,
       | ${flagCaseSql("is_slow")} AS is_slow,
       | ${flagCaseSql("has_vector")} AS has_vector,
       | ${flagCaseSql("has_stream")} AS has_stream
       |FROM documents)""".stripMargin

  /** Window-function replay of [[firstQa]] over the events table; the
    * `onlyNonempty` flag is the reference CLI's default mode
    * (extract_chat_qa_tsv.py:155): drop a session only when BOTH the
    * question AND the response are empty.
    */
  private def qaExtractSql(onlyNonempty: Boolean): String = {
    val filter =
      if (onlyNonempty)
        "WHERE coalesce(q.user_question, '') <> '' OR coalesce(resp.assistant_response, '') <> ''\n"
      else ""
    s"""WITH m AS (
       | SELECT user_id, event_id,
       |  CASE WHEN event_type IN ('view','error') THEN 'assistant' ELSE 'user' END AS role,
       |  event_type || '#' || CAST(event_id AS VARCHAR) AS content,
       |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
       | FROM events),
       |m2 AS (
       | SELECT user_id, role, content,
       |  row_number() OVER (PARTITION BY user_id ORDER BY rn) AS rn2
       | FROM m WHERE NOT (rn = 1 AND role = 'assistant')),
       |fu AS (SELECT user_id, min(rn2) AS fu_rn FROM m2 WHERE role = 'user' GROUP BY user_id),
       |brk AS (SELECT m2.user_id, min(rn2) AS brk_rn FROM m2 JOIN fu USING (user_id)
       |        WHERE rn2 > fu_rn AND role <> 'assistant' GROUP BY m2.user_id),
       |q AS (SELECT m2.user_id, content AS user_question FROM m2 JOIN fu USING (user_id)
       |      WHERE rn2 = fu_rn),
       |resp AS (SELECT m2.user_id, string_agg(content, ' ' ORDER BY rn2) AS assistant_response
       |         FROM m2 JOIN fu USING (user_id)
       |         LEFT JOIN brk ON brk.user_id = m2.user_id
       |         WHERE rn2 > fu_rn AND rn2 < coalesce(brk_rn, 9223372036854775807)
       |         GROUP BY m2.user_id)
       |SELECT u.user_id,
       | coalesce(q.user_question, '') AS user_question,
       | coalesce(resp.assistant_response, '') AS assistant_response
       |FROM (SELECT DISTINCT user_id FROM events) u
       |LEFT JOIN q USING (user_id) LEFT JOIN resp USING (user_id)
       |${filter}ORDER BY user_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // independent replay of the prompt build: per-chunk JSON by string
    // concat (compact, key order id/document_name/similarity/content —
    // Spark to_json's layout), first-12 cap via row_number, template
    // spliced verbatim (apostrophes escaped), md5 over the whole prompt
    "etl_judge_prompt" ->
      s"""WITH c AS (
         | SELECT user_id, event_id,
         |  '{"id":"c-' || CAST(event_id AS VARCHAR) ||
         |  '","document_name":"doc-' || CAST(event_id % 7 AS VARCHAR) ||
         |  '","similarity":' ||
         |  CASE WHEN event_id % 5 = 0 THEN 'null'
         |       ELSE CAST(round(value, 2) AS VARCHAR) END ||
         |  ',"content":"chunk text ' || CAST(event_id AS VARCHAR) || '"}' AS cj,
         |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         | FROM events),
         |a AS (
         | SELECT user_id,
         |  string_agg(cj, ',' ORDER BY event_id) FILTER (WHERE rn <= 12) AS body,
         |  CAST(least(count(*), 12) AS BIGINT) AS n_chunks
         | FROM c GROUP BY user_id),
         |p AS (
         | SELECT user_id, n_chunks,
         |  '${JudgePromptHead.replace("'", "''")}q-' || CAST(user_id AS VARCHAR) ||
         |  chr(10) || chr(10) || 'ASSISTANT_ANSWER:' || chr(10) ||
         |  'answer for q-' || CAST(user_id AS VARCHAR) ||
         |  chr(10) || chr(10) || 'REFERENCES (first ' || CAST(n_chunks AS VARCHAR) ||
         |  ' chunks shown):' || chr(10) || '[' || body || ']' ||
         |  chr(10) || chr(10) || 'SESSION_ID:' || chr(10) ||
         |  'sess-' || CAST(user_id AS VARCHAR) AS prompt
         | FROM a)
         |SELECT user_id, n_chunks,
         | CAST(length(prompt) AS BIGINT) AS prompt_len,
         | md5(prompt) AS prompt_md5
         |FROM p ORDER BY user_id""".stripMargin,
    "etl_dlq_route" ->
      """WITH r AS (SELECT event_id,
        |   CASE WHEN event_id % 7 = 0
        |        THEN substring(props, 1, length(props) - 1)
        |        ELSE props END AS raw
        |  FROM events),
        |p AS (SELECT event_id, raw,
        |   CASE WHEN json_valid(raw)
        |        THEN TRY_CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k
        |  FROM r)
        |SELECT event_id,
        | CASE WHEN k IS NOT NULL THEN 'ok' ELSE 'dlq' END AS status, k,
        | CASE WHEN k IS NULL THEN 'unparseable_json' END AS err,
        | CASE WHEN k IS NULL THEN raw END AS dlq_payload
        |FROM p ORDER BY event_id""".stripMargin,
    // byte-exact replica of ModelHook.StubClient over the same prompts;
    // the stub never fails, so every row carries (status = 200,
    // err = NULL) — the error columns are exercised by ModelHookSpec's
    // failing-client cases.
    "etl_model_summarize" ->
      """SELECT doc_id,
        | '[summary ' || substring(md5('summarize: ' || text), 1, 8) || '] ' ||
        |   substring('summarize: ' || text, 1, 64) AS completion,
        | CAST(200 AS INTEGER) AS status,
        | CAST(NULL AS VARCHAR) AS err
        |FROM documents ORDER BY doc_id""".stripMargin,
    // byte-exact replica of the FlakyStubClient run INCLUDING its
    // failure rows: failure iff md5(prompt) starts with '0'
    "etl_model_judge" ->
      """SELECT doc_id,
        | CASE WHEN substring(md5('judge: ' || text), 1, 1) <> '0'
        |   THEN '[judge ' || substring(md5('judge: ' || text), 1, 8) || '] ' ||
        |        substring('judge: ' || text, 1, 64) END AS completion,
        | CAST(CASE WHEN substring(md5('judge: ' || text), 1, 1) = '0'
        |   THEN 503 ELSE 200 END AS INTEGER) AS status,
        | CASE WHEN substring(md5('judge: ' || text), 1, 1) = '0'
        |   THEN 'ModelCallException: service unavailable' END AS err
        |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_sse_parse" ->
      """WITH r AS (
        | SELECT event_id,
        |  'event: message' || chr(10) ||
        |  'data: {"code": 0, "data": {"answer": "partial ' || event_id || '"}}' || chr(10) ||
        |  'data: {"code": 1, "message": "transient error"}' || chr(10) ||
        |  CASE WHEN event_id % 2 = 0
        |   THEN 'data: {"code": 0, "data": {"answer": "final ' || event_id || '", "session_id": "sess-' || user_id || '", "reference": {"total": ' || (props->>'k') || '}}}'
        |   ELSE 'data: {"code": 0, "data": {"answer": "final ' || event_id || '", "session_id": "sess-' || user_id || '"}}'
        |  END || chr(10) || 'data: [DONE]' AS raw
        | FROM events),
        |c AS (
        | SELECT event_id,
        |  list_filter(
        |    list_filter(
        |      list_transform(
        |        list_filter(string_split(raw, chr(10)), l -> l LIKE 'data:%'),
        |        l -> trim(substring(l, 6))),
        |      c -> c NOT IN ('[DONE]', 'null', 'None') AND c <> '' AND json_valid(c)),
        |    c -> json_extract_string(c, '$.code') = '0'
        |         AND json_extract(c, '$.data') IS NOT NULL) AS chunks
        | FROM r),
        |x AS (
        | SELECT event_id,
        |  list_filter(list_transform(chunks, ch -> json_extract_string(ch, '$.data.answer')), a -> a IS NOT NULL) AS answers,
        |  list_filter(list_transform(chunks, ch -> json_extract_string(ch, '$.data.session_id')), a -> a IS NOT NULL) AS sessions,
        |  list_filter(list_transform(chunks, ch -> json_extract_string(ch, '$.data.reference.total')), a -> a IS NOT NULL) AS totals
        | FROM c)
        |SELECT event_id,
        | coalesce(answers[-1], '') AS answer,
        | coalesce(sessions[-1], '') AS session_id,
        | coalesce(CAST(totals[-1] AS BIGINT), 0) AS total_references
        |FROM x ORDER BY event_id""".stripMargin,
    "etl_flatten_json" ->
      """SELECT event_id,
        | user_id AS "payload.user.id",
        | event_type AS "payload.user.type",
        | CAST(event_id AS VARCHAR) || ', ' || CAST(user_id AS VARCHAR) AS "payload.ids",
        | CAST(props->>'k' AS BIGINT) AS "payload.k"
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_tristate_flags" ->
      s"""$flagsCte
         |SELECT doc_id, has_dup, is_slow, has_vector, has_stream
         |FROM f ORDER BY doc_id""".stripMargin,
    "etl_other_text" ->
      raw"""SELECT doc_id,
           | CASE WHEN NOT regexp_matches(lower(text), 'dup|dups|slow|vector|vectors|stream|streaming')
           |      THEN text END AS other_text
           |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_active_features" ->
      s"""$flagsCte
         |SELECT doc_id, concat_ws(', ',
         |  CASE WHEN has_dup = 'Yes' THEN 'has dup' END,
         |  CASE WHEN is_slow = 'Yes' THEN 'is slow' END,
         |  CASE WHEN has_vector = 'Yes' THEN 'has vector' END,
         |  CASE WHEN has_stream = 'Yes' THEN 'has stream' END) AS features
         |FROM f ORDER BY doc_id""".stripMargin,
    "etl_flag_summary" ->
      s"""$flagsCte, m AS (
         | SELECT 'has_dup' AS flag, has_dup AS value FROM f
         | UNION ALL SELECT 'is_slow', is_slow FROM f
         | UNION ALL SELECT 'has_vector', has_vector FROM f
         | UNION ALL SELECT 'has_stream', has_stream FROM f)
         |SELECT flag, value, CAST(count(*) AS BIGINT) AS n
         |FROM m GROUP BY flag, value ORDER BY flag, value""".stripMargin,
    "etl_qa_extract" -> qaExtractSql(onlyNonempty = false),
    // the reference CLI default: drop sessions with an empty side
    "etl_qa_extract_nonempty" -> qaExtractSql(onlyNonempty = true),
    // closed-form replay of the stub API: chat i has (i % 5) + 1
    // sessions, session j's message shape is case (i + j) % 4 — the
    // oracle derives the expected QA output per case, independently of
    // the engine's page loop / JSON parse / array extraction.
    "etl_paged_qa" ->
      s"""WITH chats AS (SELECT CAST(i AS INT) AS i
         |  FROM generate_series(0, ${PagedNumChats - 1}) t(i)),
         |s AS (SELECT i, CAST(unnest(generate_series(1, (i % 5) + 1)) AS INT) AS j
         |  FROM chats),
         |c AS (SELECT i, j, (i + j) % 4 AS cse FROM s)
         |SELECT 'chat_' || i AS chat_id,
         | 's-' || i || '-' || j AS session_id,
         | CASE WHEN cse = 2 THEN '' ELSE 'q-' || i || '-' || j END AS user_question,
         | CASE WHEN cse = 0 THEN 'a-' || i || '-' || j || '-1 a-' || i || '-' || j || '-2'
         |      WHEN cse = 1 THEN 'a-' || i || '-' || j || '-1'
         |      ELSE '' END AS assistant_response
         |FROM c ORDER BY chat_id, session_id""".stripMargin,
    "etl_sanitize_text" ->
      """SELECT doc_id,
        | trim(replace(replace(replace(
        |   '  ' || text || chr(9) || source || chr(10),
        |   chr(9), ' '), chr(13), ' '), chr(10), ' ')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_ref_chunks" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS total_references,
        | string_agg(CAST(event_id AS VARCHAR), ', ' ORDER BY event_id) AS chunk_ids,
        | string_agg(event_type, ', ' ORDER BY event_id) AS document_names,
        | string_agg(CAST(round(value, 2) AS VARCHAR), ', ' ORDER BY event_id) AS similarities
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "etl_ref_chunks_multi" ->
      """WITH c AS (SELECT user_id, event_id, event_type,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE round(value, 2) END AS sim,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE round(value * 2, 2) END AS vsim,
        |  CASE WHEN event_id % 9 = 0 THEN 0.0 ELSE round(value * 3, 2) END AS tsim
        | FROM events),
        |k AS (SELECT user_id, event_id, event_type,
        |  CASE WHEN sim IS NULL OR sim = 0 THEN '' ELSE CAST(sim AS VARCHAR) END AS sim,
        |  CASE WHEN vsim IS NULL OR vsim = 0 THEN '' ELSE CAST(vsim AS VARCHAR) END AS vsim,
        |  CASE WHEN tsim IS NULL OR tsim = 0 THEN '' ELSE CAST(tsim AS VARCHAR) END AS tsim
        | FROM c)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS total_references,
        | string_agg(CAST(event_id AS VARCHAR), ', ' ORDER BY event_id) AS chunk_ids,
        | string_agg(event_type, ', ' ORDER BY event_id) AS document_names,
        | string_agg(sim, ', ' ORDER BY event_id) AS similarities,
        | string_agg(vsim, ', ' ORDER BY event_id) AS vector_similarities,
        | string_agg(tsim, ', ' ORDER BY event_id) AS term_similarities
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,
    // closed-form replay of the composed create->ask->degrade flow:
    // every field is a pure function of (event_id, user_id, value),
    // independent of the engine's SSE synthesis + parse, so a
    // mis-parsed stream, a dropped degraded row, a wrong coercion or
    // a broken total fallback all fail the hash.
    "etl_chat_sessions" ->
      """WITH r AS (SELECT event_id, user_id,
        |   round(value, 2) AS s1, round(value * 2, 2) AS v1, round(value * 3, 2) AS t1,
        |   event_id % 11 = 0 AS cfail, event_id % 13 = 0 AS aempty,
        |   event_id % 5 = 0 AS s1null, event_id % 9 = 0 AS t1zero,
        |   event_id % 3 = 0 AS nototal
        |  FROM events),
        |b AS (SELECT *, cfail OR aempty AS degraded FROM r)
        |SELECT event_id,
        | 'q-' || event_id AS question,
        | CASE WHEN degraded THEN '' ELSE 'final ' || event_id END AS answer,
        | CAST(CASE WHEN cfail THEN 500 ELSE 200 END AS BIGINT) AS status_code,
        | CASE WHEN cfail THEN ''
        |      ELSE 'sess-' || user_id || '-' || event_id END AS session_id,
        | CAST(CASE WHEN degraded THEN 0 WHEN nototal THEN 2 ELSE 3 END AS BIGINT)
        |   AS total_references,
        | CASE WHEN degraded THEN ''
        |      ELSE 'c-' || event_id || '-1, c-' || event_id || '-2' END AS chunk_ids,
        | CASE WHEN degraded THEN ''
        |      ELSE 'doc-' || (event_id % 7) || ', doc-' || (event_id % 7) END
        |   AS document_names,
        | CASE WHEN degraded THEN ''
        |      ELSE (CASE WHEN s1null OR s1 = 0 THEN '' ELSE CAST(s1 AS VARCHAR) END)
        |           || ', ' || CAST(s1 + 1 AS VARCHAR) END AS similarities,
        | CASE WHEN degraded THEN ''
        |      ELSE (CASE WHEN v1 = 0 THEN '' ELSE CAST(v1 AS VARCHAR) END)
        |           || ', ' || CAST(v1 + 1 AS VARCHAR) END AS vector_similarities,
        | CASE WHEN degraded THEN ''
        |      ELSE (CASE WHEN t1zero OR t1 = 0 THEN '' ELSE CAST(t1 AS VARCHAR) END)
        |           || ', ' || CAST(t1 + 1 AS VARCHAR) END AS term_similarities
        |FROM b ORDER BY event_id""".stripMargin,
    // closed-form replay of the composed judge pipeline: the judge's
    // inner JSON, labels/scores/notes and the quality ladder are all
    // pure functions of event_id, INDEPENDENT of which API envelope
    // (event_id % 6) the engine had to unwrap — a mishandled envelope
    // corrupts 1/6 of rows and fails the hash.
    "etl_judge_pipeline" ->
      """WITH b AS (SELECT event_id,
        |  event_id % 13 = 0 AS failed,
        |  NOT (event_id % 11 = 1) AS present,
        |  event_id % 2 = 0 AS direct,
        |  event_id % 7 = 0 AS wrong,
        |  event_id % 5 = 0 AS partial,
        |  NOT (event_id % 3 = 0) AS supports,
        |  NOT (event_id % 4 = 0) AS complete
        | FROM events),
        |j AS (SELECT event_id, failed,
        |  '{"answer_present":' || CASE WHEN present THEN 'true' ELSE 'false' END ||
        |  ',"answer_direct":' || CASE WHEN direct THEN 'true' ELSE 'false' END ||
        |  ',"answer_wrong":' || CASE WHEN wrong THEN 'true' ELSE 'false' END ||
        |  ',"answer_partial":' || CASE WHEN partial THEN 'true' ELSE 'false' END ||
        |  ',"retrieval_supports_answer":' || CASE WHEN supports THEN 'true' ELSE 'false' END ||
        |  ',"retrieval_complete":' || CASE WHEN complete THEN 'true' ELSE 'false' END ||
        |  '}' AS labels,
        |  '{"overall":' || CAST(event_id % 10 AS VARCHAR) || '}' AS scores,
        |  CASE
        |   WHEN wrong THEN 'RED'
        |   WHEN NOT present THEN 'RED'
        |   WHEN NOT supports THEN 'RED'
        |   WHEN partial THEN 'YELLOW'
        |   WHEN NOT complete THEN 'YELLOW'
        |   WHEN direct THEN 'GREEN'
        |   ELSE 'YELLOW' END AS color
        | FROM b)
        |SELECT event_id,
        | CASE WHEN failed THEN ''
        |      ELSE '{"labels":' || labels || ',"scores":' || scores ||
        |           ',"notes":"note ' || CAST(event_id AS VARCHAR) || '"}' END AS judge_json,
        | CASE WHEN failed THEN '' ELSE labels END AS judge_labels,
        | CASE WHEN failed THEN '' ELSE scores END AS judge_scores,
        | CASE WHEN failed THEN 'unable to parse judge JSON'
        |      ELSE 'note ' || CAST(event_id AS VARCHAR) END AS judge_notes,
        | CASE WHEN failed THEN 'GRAY' ELSE color END AS quality_color
        |FROM j ORDER BY event_id""".stripMargin,
    "etl_judge_json_parse" ->
      """SELECT event_id,
        | regexp_extract('judge says: ' || props || ' -- end', '{.*}', 0) AS judge_json,
        | CAST(regexp_extract('judge says: ' || props || ' -- end', '{.*}', 0)->>'k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_quality_color" ->
      """SELECT doc_id,
        | CASE
        |  WHEN text LIKE '%dup%' AND text LIKE '%slow%' THEN 'RED'
        |  WHEN text LIKE '%vector%' AND text NOT LIKE '%table%' THEN 'RED'
        |  WHEN text LIKE '%merge%' AND text LIKE '%window%' THEN 'RED'
        |  WHEN NOT (n_chars > 50) THEN 'RED'
        |  WHEN text NOT LIKE '%table%' THEN 'RED'
        |  WHEN text LIKE '%slow%' THEN 'YELLOW'
        |  WHEN text NOT LIKE '%query%' THEN 'YELLOW'
        |  WHEN NOT (text LIKE '%data%' OR text LIKE '%row%') THEN 'YELLOW'
        |  WHEN text LIKE '%batch%' AND text LIKE '%stream%' THEN 'YELLOW'
        |  WHEN text LIKE '%customer%' THEN 'YELLOW'
        |  WHEN text LIKE '%fast%' AND text LIKE '%table%' THEN 'GREEN'
        |  WHEN n_chars > 50 THEN 'YELLOW'
        |  ELSE 'GRAY' END AS quality_color
        |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_json_to_text" ->
      """SELECT o_orderkey,
        | 'Order ' || CAST(o_orderkey AS VARCHAR) ||
        | ' was placed on ' || strftime(o_orderdate, '%Y-%m-%d') ||
        | ' by ' || c_name ||
        | ' with priority ' || o_orderpriority ||
        | ' for a total of ' || CAST(round(o_totalprice, 2) AS VARCHAR) ||
        | '.' AS summary
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)
}
