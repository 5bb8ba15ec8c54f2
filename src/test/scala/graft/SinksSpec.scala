package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

class SinksSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  test("csv roundtrip preserves rows and header") {
    val df = Tables.nation(spark, sf)
    val path = tmp("csv")
    Sinks.writeCsv(df, path)
    val back = Sinks.readCsv(spark, path)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("tsv write sanitizes control characters in cells") {
    import spark.implicits._
    val dirty = Seq((1L, "a\tb\nc"), (2L, " x ")).toDF("id", "s")
    val path = tmp("tsv")
    Sinks.writeTsv(dirty, path, singleFile = true)
    val back = Sinks.readTsv(spark, path)
    val vals = back.orderBy("id").collect().map(_.getString(1))
    assert(vals(0) == "a b c")
    assert(vals(1) == "x")
  }

  test("jsonl roundtrip preserves typed values") {
    val df = Tables.region(spark, sf)
    val path = tmp("jsonl")
    Sinks.writeJsonl(df, path)
    val back = Sinks.readJsonl(spark, path)
      .select("r_regionkey", "r_name").orderBy("r_regionkey")
    assert(back.collect().map(_.toSeq).toSeq ==
      df.select("r_regionkey", "r_name").orderBy("r_regionkey").collect().map(_.toSeq).toSeq)
  }

  test("partitioned parquet prunes partitions at read") {
    val df = Tables.documents(spark, sf)
    val path = tmp("part")
    Sinks.writePartitionedParquet(df, path, "lang")
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("lang=")) >= 2, dirs.toSeq.toString)
    val en = spark.read.parquet(path).filter(col("lang") === "en")
    // partition filter must appear in the scan, not a post-filter
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(en.count() == df.filter(col("lang") === "en").count())
  }

  test("ensureColumns adds missing required columns as typed nulls") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq((1L, "x")).toDF("id", "facilities")
    val required = StructType(Seq(
      StructField("id", LongType),
      StructField("facilities", StringType),
      StructField("restrictions", StringType),
      StructField("activities", StringType)))
    val out = Sinks.ensureColumns(df, required)
    assert(out.columns.toSeq == Seq("id", "facilities", "restrictions", "activities"))
    val r = out.head
    assert(r.getAs[String]("facilities") == "x")
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("qa extract written as TSV is valid (reference output format)") {
    val qa = operators.Etl.etlQaExtract(spark, sf)
    val path = tmp("qatsv")
    Sinks.writeTsv(qa, path, singleFile = true)
    val back = Sinks.readTsv(spark, path)
    assert(back.count() == qa.count())
  }
}
