package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet tables.
  *
  * One loader per table so every operator reads through the same path;
  * parquet keeps column pruning + predicate pushdown available to
  * Catalyst (verified via `PushedFilters` / `ReadSchema` in explain).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val InferFiltersRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // InferFiltersFromGenerate turns explode(<interpreted lambda>) into
    // a pushed-down scan filter with the lambda fully inlined — per-row
    // interpreted evaluation re-computes every subexpression (measured
    // ~7s instead of ~0.5s on the shingle pipeline at sf0.1). The
    // arrays fed to explode here are never empty, so the inferred
    // filter only costs. Appended (not assigned) so a caller's own
    // excludedRules survive; no-op when already present.
    val key = "spark.sql.optimizer.excludedRules"
    val cur = spark.conf.getOption(key).filter(_.trim.nonEmpty)
    if (!cur.exists(_.split(",").map(_.trim).contains(InferFiltersRule)))
      spark.conf.set(key, cur.map(_ + "," + InferFiltersRule).getOrElse(InferFiltersRule))
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a raw int64 via the legacy
    * conf, then rebuild a TimestampType column truncated to micros
    * (integer `div`, not `/`, to avoid double-precision loss on
    * ~1.7e18 nanosecond values).
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
