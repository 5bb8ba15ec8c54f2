package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CLI dispatcher must write exactly what the gate-certified
  * library functions return — same rows, same columns — in each
  * supported format, and reject unknown names/flags loudly.
  */
class CliSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("out").toString

  test("pipeline subcommand writes the gate row's exact result (tsv round-trip)") {
    val out = tmp("cli-parks")
    Cli.run(spark, "normalize-parks", sf, out, "tsv", singleFile = true, delayMs = 0)
    val expected = SparkEntry.queries("etl_flatten_json")(spark, sf)
    val written = spark.read.option("header", "true").option("sep", "\t")
      .option("inferSchema", "false").csv(out)
    assert(written.columns.toSeq == expected.columns.toSeq)
    // compare as strings (csv round-trips values through text anyway);
    // backticks because flatten's column names carry dots
    def strs(df: org.apache.spark.sql.DataFrame) = df
      .select(df.columns.map(c =>
        coalesce(col(s"`$c`").cast("string"), lit("~null~")).as("v_" + c)).toIndexedSeq: _*)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(strs(written) == strs(expected))
    // one part file: the --single-file contract
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".csv")) == 1)
  }

  test("generic query-id path runs any registered query; parquet format") {
    val out = tmp("cli-q1")
    Cli.run(spark, "q1_pricing_summary", sf, out, "parquet", singleFile = false, delayMs = 0)
    val expected = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    val written = spark.read.parquet(out).collect()
    assert(written.map(_.toSeq).toSet == expected.map(_.toSeq).toSet)
  }

  test("delay-ms reaches the model stage without changing its output; rejected elsewhere") {
    val out = tmp("cli-judge")
    Cli.run(spark, "model-judge", sf, out, "parquet", singleFile = false, delayMs = 5)
    val expected = operators.Etl.etlModelJudge(spark, sf).collect()
    val written = spark.read.parquet(out).orderBy(col("doc_id")).collect()
    assert(written.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Cli.run(spark, "normalize-parks", sf, tmp("cli-bad"), "parquet",
        singleFile = false, delayMs = 5)
    }
  }

  test("unknown pipeline fails loudly") {
    intercept[RuntimeException] {
      Cli.run(spark, "no-such-pipeline", sf, tmp("cli-none"), "parquet",
        singleFile = false, delayMs = 0)
    }
  }
}
