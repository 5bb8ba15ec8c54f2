package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Etl, JsonFlatten}

class EtlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tristate: Yes wins over 'no <kw>' (np.select precedence)") {
    import spark.implicits._
    val df = Seq("no dup here", "a dup", "nothing", "no slow").toDF("t")
      .select(Etl.tristate(col("t"), Seq("dup")).as("v"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("Yes", "Yes", "Don't Know", "Don't Know"))
  }

  test("tristate: word boundary required") {
    import spark.implicits._
    val df = Seq("dups are here", "duplicate").toDF("t")
      .select(Etl.tristate(col("t"), Seq("dup")).as("v"))
    // "dups" does not match \bdup\b; "duplicate" neither.
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Don't Know", "Don't Know"))
  }

  test("JsonFlatten: structs expand, arrays join") {
    import spark.implicits._
    val df = Seq((1L, (2L, "x"), Seq(1L, 2L, 3L))).toDF("id", "s", "arr")
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "s._1", "s._2", "arr"))
    val r = flat.head
    assert(r.getAs[String]("arr") == "1, 2, 3")
    assert(r.getAs[Long]("s._1") == 2L)
  }

  test("qa extract: greeting dropped, contiguous assistant concat") {
    val qa = Etl.etlQaExtract(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("user_question"), r.getAs[String]("assistant_response"))).toMap
    // Recompute expectation for one user straight from the table.
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    byUser.take(5).foreach { case (u, rows) =>
      var msgs = rows.sortBy(_._2).toSeq.map { case (_, id, t) =>
        val role = if (t == "view" || t == "error") "assistant" else "user"
        (role, s"$t#$id")
      }
      if (msgs.nonEmpty && msgs.head._1 == "assistant") msgs = msgs.tail
      val fu = msgs.indexWhere(_._1 == "user")
      val (q, a) =
        if (fu < 0) ("", "")
        else (msgs(fu)._2,
          msgs.drop(fu + 1).takeWhile(_._1 == "assistant").map(_._2).mkString(" "))
      assert(qa(u) == ((q, a)), s"user $u")
    }
  }

  test("qa extract nonempty: drops only BOTH-empty sessions (reference CLI default)") {
    // extract_chat_qa_tsv.py:155 skips iff `not user_q and not
    // assistant_resp` — a one-side-empty session IS written.
    val all = Etl.etlQaExtract(spark, sf)
    val kept = Etl.etlQaExtractNonempty(spark, sf)
    val expected = all.filter(!(col("user_question") === "" && col("assistant_response") === ""))
    assert(kept.count() == expected.count())
    // the filter must not be the stricter AND form: any one-side-empty
    // session in the data must survive
    val oneSide = all.filter(
      (col("user_question") === "") =!= (col("assistant_response") === "")).count()
    val bothNonempty =
      all.filter(col("user_question") =!= "" && col("assistant_response") =!= "").count()
    assert(kept.count() == bothNonempty + oneSide)
  }

  test("quality color cascade covers RED/YELLOW/GREEN") {
    val colors = Etl.etlQualityColor(spark, sf)
      .groupBy("quality_color").count().collect()
      .map(r => r.getString(0)).toSet
    assert(colors.subsetOf(Set("RED", "YELLOW", "GREEN", "GRAY")))
    assert(colors.contains("RED") && colors.contains("YELLOW"))
  }

  test("sanitize strips injected control characters") {
    val clean = Etl.etlSanitizeText(spark, sf).head.getAs[String]("clean")
    assert(!clean.exists(c => c == '\t' || c == '\n' || c == '\r'))
    assert(!clean.startsWith(" ") && !clean.endsWith(" "))
  }
}
