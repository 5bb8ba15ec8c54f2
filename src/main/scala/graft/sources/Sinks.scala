package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 file formats beyond parquet, with the reference toolkit's
  * conventions:
  *  - CSV with header (normalize_parks_json.py output,
  *    test_chat_assistant*.py results files);
  *  - TSV with header and tab/CR/LF-sanitized cells
  *    (extract_chat_qa_tsv.py:34-40 — `safe_text` guarantees a valid
  *    TSV, re-expressed here as a declarative pre-write transform);
  *  - JSON Lines (the scalable form of the reference's JSON files).
  *
  * All writers go through the DataFrameWriter so they scale to
  * many-file distributed output; `singleFile` exists for the
  * reference's one-file CLI ergonomics (explicit coalesce(1) — a
  * deliberate, documented serial point, not a default).
  */
object Sinks {

  /** Sanitize every string column for TSV safety (tab/CR/LF → space,
    * trim) — the reference's safe_text applied engine-wide.
    */
  def sanitized(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        trim(translate(col(f.name), "\t\r\n", "   ")).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) sanitized(df).coalesce(1) else sanitized(df))
      .write.mode("overwrite")
      .option("header", "true").option("sep", "\t").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet: the default layout for large
    * outputs — readers prune partitions on the partition column, and
    * each partition writes in parallel.
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("sep", "\t")
      .option("inferSchema", "true").csv(path)

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Whole-file nested JSON documents — the reference's ingestion shape
    * (normalize_parks_json.py:40 and convert_json_to_text.py:97 each
    * `json.load` ONE pretty-printed nested document per file, which
    * JSON-lines readers cannot parse). `multiLine` mode makes Spark
    * treat each file as a single JSON value: a top-level object becomes
    * one row, a top-level array becomes one row per element; nested
    * objects/arrays arrive as struct/array columns ready for
    * [[graft.operators.JsonFlatten.flatten]]. Schema inference reads
    * the files once; pass `schema` to skip that extra pass (the right
    * call at scale — one inference pass over 100 TB of JSON is a full
    * corpus read).
    */
  def readJsonDocs(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(r.schema).json(path)
  }

  /** Bucketed + sorted table: the co-located-join layout. Writing a
    * fact table bucketed by its join/aggregation key lets every later
    * `groupBy(key)` / equi-join on the key run WITHOUT an exchange
    * (PlanSpec asserts the no-shuffle aggregation) — at 100 TB,
    * pre-bucketing the big tables once replaces a full shuffle per
    * downstream query. Bucketed output requires the table catalog
    * (`saveAsTable`), not a bare path.
    */
  def writeBucketedTable(df: DataFrame, table: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** ORC read/write: the other columnar format large warehouses hand
    * an engine (Hive-era lakes are ORC; Spark's reader is vectorized
    * and supports the same predicate pushdown / column pruning as
    * parquet). Same writer conventions as the parquet path, including
    * Hive-style partitioning.
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: String*): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema normalization: guarantee the presence and order of a
    * required column set, adding missing ones as typed nulls — the
    * reference's "ensure text columns exist" step
    * (normalize_parks_json.py:164-166) generalized to any schema.
    */
  def ensureColumns(df: DataFrame, required: org.apache.spark.sql.types.StructType): DataFrame = {
    val existing = df.schema.fieldNames.toSet
    val cols = required.fields.map { f =>
      if (existing.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
