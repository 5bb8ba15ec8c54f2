package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants for the scalar/ETL building blocks —
  * generated inputs driven through the engine (small DataFrames), not
  * re-implemented. Uses raw scalacheck Gens with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  import graft.operators.Etl

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sanitize is idempotent and never emits control chars") {
    val texts = samples(textGen, 12) ++ Seq("a\tb\r\nc", "  pad  ", "\t\t", "")
    val clean = texts.toDF("raw")
      .select(trim(translate(col("raw"), "\t\r\n", "   ")).as("c1"))
      .select(col("c1"), trim(translate(col("c1"), "\t\r\n", "   ")).as("c2"))
      .collect()
    clean.foreach { r =>
      assert(r.getString(0) == r.getString(1), "not idempotent")
      assert(!r.getString(0).exists(c => c == '\t' || c == '\n' || c == '\r'))
    }
  }

  test("tristate returns only the three states; keyword presence implies Yes") {
    val texts = samples(textGen, 15) ++ Seq("dup", "a dup b", "no dup", "dups")
    val out = texts.toDF("t")
      .select(col("t"), Etl.tristate(col("t"), Seq("dup")).as("v"))
      .collect()
    out.foreach { r =>
      val (t, v) = (r.getString(0), r.getString(1))
      assert(Set("Yes", "No", "Don't Know").contains(v))
      if (t.split(" ").contains("dup")) assert(v == "Yes", s"'$t' -> $v")
    }
  }

  test("dot(v, v) = |v|^2 >= 0 and is symmetric") {
    import graft.functions.DotProduct.dot
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    samples(Gen.zip(vecGen, vecGen), 10).foreach { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val r = df.select(
        dot(col("a"), col("a")).as("aa"),
        dot(col("a"), col("b")).as("ab"),
        dot(col("b"), col("a")).as("ba")).head
      assert(r.getDouble(0) >= 0.0)
      assert(r.getDouble(1) == r.getDouble(2))
    }
  }

  test("bag fingerprint is order-insensitive") {
    samples(Gen.listOfN(6, wordGen), 10).foreach { words =>
      val t1 = words.mkString(" ")
      val t2 = new scala.util.Random(7).shuffle(words).mkString(" ")
      val fp = Seq(t1, t2).toDF("text")
        .select(md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
        .collect().map(_.getString(0))
      assert(fp(0) == fp(1))
    }
  }

  test("shingle kernel is byte-identical to the expression form on edge-case texts") {
    import graft.operators.{Dedup, TextAnalysis}
    // generated word-soup plus the edge shapes the parity argument
    // rests on: < 3 tokens, empty tokens from doubled/leading/trailing
    // spaces, repeated windows (distinct), the empty string
    val texts = samples(Gen.listOfN(12, wordGen).map(_.mkString(" ")), 10) ++ Seq(
      "", "a", "a b", "a b c", "x y x y x y x y",
      "a  b c d", " a b c", "a b c ", "a   b", "dup dup dup dup")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = Dedup.shingleArrays(spark, docs)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val exprForm = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("sh", expr(TextAnalysis.shingleExpr))
      .orderBy("doc_id").select("sh").collect().map(_.getSeq[String](0))
    kernel.zip(exprForm).zipWithIndex.foreach { case ((k, e), i) =>
      assert(k == e, s"parity broke on text ${texts(i)}: kernel=$k expr=$e")
    }
  }
}
