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

  /** Number of versioned-table shards for [[writeVerdictReport]] —
    * the upsert's partition key must be STABLE per document (the
    * versioned merge contract is partition-scoped), so the verdict
    * history shards on the doc id, never on the verdict itself.
    */
  val VerdictShards = 16

  /** Curation rule-report sink: persist a keep-list verdict frame
    * (`doc_id`, `reason`, …, the [[graft.operators.Curation.curKeepList]]
    * shape) in BOTH the layouts a production curation loop reads —
    *
    *  1. a Hive-partitioned report at `reportPath` partitioned by the
    *     first-failing `reason`, so "show me everything the
    *     contamination rule dropped this crawl" is a partition-pruned
    *     scan;
    *  2. an upsert into the manifest-log versioned table at
    *     `versionedPath`, so successive crawls' verdicts are
    *     time-travelable and `Versioned.diff` answers "which
    *     documents changed verdict between crawl N and N+1". The
    *     versioned partition key is a STABLE doc-id shard (NOT the
    *     reason — a verdict flip must merge last-write-wins in place,
    *     and the versioned merge contract scopes keys to their
    *     partition).
    *
    * Returns the committed version. No oracle: the verdicts
    * themselves are the oracle-gated `cur_keep_list` row; this is the
    * lakehouse composition, exercised by SinksSpec.
    */
  def writeVerdictReport(spark: SparkSession, verdicts: DataFrame,
      reportPath: String, versionedPath: String): Int = {
    writePartitionedParquet(verdicts, reportPath, "reason")
    // int shard: Hive partition-directory inference reads the value
    // back as Integer, so a long batch column would type-conflict on
    // the second upsert
    Versioned.upsert(spark, versionedPath,
      verdicts.withColumn("shard",
        pmod(col("doc_id"), lit(VerdictShards.toLong)).cast("int")),
      "doc_id", "shard")
  }

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

  /** Avro read/write — the row-oriented interchange format streaming
    * buses and schema registries hand an engine (Kafka payloads,
    * cross-language pipelines). Built into Spark 4's sql module (no
    * external package); same writer conventions as the parquet path,
    * including Hive-style partitioning — an Avro landing zone prunes
    * partitions exactly like a parquet one, the columnar formats stay
    * the ANALYTICS layout.
    */
  /** Spark ships the Avro implementation inside spark-sql but leaves
    * the `avro` SHORT NAME to the external spark-avro module's
    * service registration — absent here (offline classpath), the
    * fully-qualified provider selects the same built-in format. */
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String, partitionCols: String*): Unit = {
    val w = df.write.mode("overwrite").format(AvroProvider)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).save(path)
  }

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroProvider).load(path)

  /** XML read/write — the document-feed shape enterprise dumps and
    * legacy APIs arrive in (built into Spark 4, SPARK-44265: the
    * spark-xml datasource moved into core). `rowTag` names the
    * repeated record element; nested elements arrive as struct/array
    * columns ready for [[graft.operators.JsonFlatten.flatten]], the
    * same schema-on-read contract as [[readJsonDocs]]. Pass `schema`
    * to skip the inference pass (one inference over 100 TB of XML is
    * a full corpus read).
    */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").format("xml").option("rowTag", rowTag).save(path)

  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(r.schema).load(path)
  }

  /** Z-order (Morton-interleaved) clustered write: the lake layout for
    * MULTI-dimension pruning. A plain sort gives parquet files tight
    * min/max ranges on the leading column only; interleaving the bits
    * of both columns' bucket ids into one z-value and range-writing on
    * it gives every file a small bounding BOX, so min/max file and
    * row-group skipping works for predicates on either column. The
    * per-column bucket is linear over the broadcast (min, max) scalar
    * aggregate — one bounded agg, one map-side projection, one range
    * exchange: nothing here is driver-side or skew-fragile beyond the
    * range partitioner's own sampling. (Under heavy value skew,
    * substitute quantile boundaries for the linear scale; the
    * interleave is unchanged.)
    */
  def writeZOrdered(df: DataFrame, path: String, zc1: String, zc2: String,
      numFiles: Int = 32, bits: Int = 16): Unit = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val maxB = (1L << bits) - 1
    val stats = df.agg(
      min(col(zc1)).cast("double").as("zmn1"), max(col(zc1)).cast("double").as("zmx1"),
      min(col(zc2)).cast("double").as("zmn2"), max(col(zc2)).cast("double").as("zmx2"))
    def bucket(c: String, mn: String, mx: String) =
      when(col(mx) === col(mn), lit(0L)).otherwise(
        least(lit(maxB), greatest(lit(0L),
          floor((col(c).cast("double") - col(mn)) / (col(mx) - col(mn)) * maxB))))
    val zval = expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
         | acc + shiftleft(shiftright(zb1, i) & 1, 2 * i)
         |     + shiftleft(shiftright(zb2, i) & 1, 2 * i + 1))""".stripMargin)
    df.crossJoin(broadcast(stats))
      .withColumn("zb1", bucket(zc1, "zmn1", "zmx1"))
      .withColumn("zb2", bucket(zc2, "zmn2", "zmx2"))
      .withColumn("zval", zval)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zmn1", "zmx1", "zmn2", "zmx2", "zb1", "zb2", "zval")
      .write.mode("overwrite").parquet(path)
  }

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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes`-sized files. Streaming sinks, per-partition
    * writers and incremental append jobs accrete thousands of small
    * files; at 100 TB the next scan then pays a task per file plus
    * listing/metadata pressure, so periodic compaction is standard
    * lake maintenance. Output file count = ceil(on-disk bytes /
    * target), from the file listing — no data pass. With `sortCol`
    * the rewrite range-partitions and sorts within files, so the
    * compacted files carry tight min/max ranges and row-group
    * skipping keeps working; without it rows round-robin. The rewrite
    * lands in a `_compact_tmp` sibling first and swaps in via two
    * renames, so a failed compaction leaves the input untouched (the
    * swap itself is the usual non-transactional-lake caveat — table
    * formats with commit protocols close that window, not raw
    * parquet dirs). Returns the compacted file count.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20, sortCol: Option[String] = None): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(hPath).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(path)
    val out = sortCol match {
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nFiles)
    }
    val tmp = new org.apache.hadoop.fs.Path(hPath.getParent, hPath.getName + "_compact_tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(hPath.getParent, hPath.getName + "_compact_old")
    if (!fs.rename(hPath, old)) throw new java.io.IOException(s"compact: cannot move $hPath aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath) // roll back
      throw new java.io.IOException(s"compact: cannot swap in $tmp")
    }
    fs.delete(old, true)
    fs.listStatus(hPath).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Copy-on-write keyed upsert into a hive-partitioned parquet
    * table — the MERGE primitive of the table formats (Delta /
    * Iceberg / Hudi CoW) at its engine-level essence: rows in
    * `updates` replace existing rows with the same key, new keys
    * append, and ONLY the partitions containing updated keys are
    * read or rewritten — untouched partitions are never opened.
    *
    * Key scope contract (Hudi's non-global-index semantics): the key
    * identifies a row WITHIN its partition. An update row replaces
    * the same (key, partition) row; a row whose key exists under a
    * DIFFERENT partition value is an insert there, and the old
    * partition's row is untouched — a key "moving" partitions must be
    * expressed by the caller as a delete + insert, exactly as with a
    * Hudi record-key + partition-path index. Global-key enforcement
    * would require scanning every partition and is the documented
    * trade this primitive refuses. Null partition values are rejected
    * up front: hive's null-partition encoding would make the pruning
    * filter silently exclude (and the swap then drop) pre-existing
    * null-partition survivors.
    *
    * The update batch must be unique on (key, partition) — MERGE
    * semantics make "two updates for one target row" ambiguous, so
    * rather than silently keeping both (or an arbitrary one) the
    * batch is validated up front and rejected loudly; callers with a
    * preference order resolve it before calling (e.g. a row_number
    * pick on their version column).
    *
    * Mechanics: the update batch is materialized once (it is read
    * three times: partition-value prune, anti-join side, union side);
    * the existing-table scan is pruned to the batch's partitions —
    * via a static `isin` literal when the batch touches few
    * partitions (guaranteed listing-level pruning), or a broadcast
    * left-semi join above that (dynamic partition pruning; a literal
    * list of thousands of values would bloat the plan and the
    * predicate evaluation). Survivors = existing rows anti-joined
    * against the update (key, partition) pairs — key AND partition,
    * per the non-global-index contract above: a key updated in p2
    * must not delete its un-updated namesake in p1. Survivors ∪
    * updates is written to a per-invocation tmp dir and each affected
    * `partCol=value` directory is swapped in with aside/rollback
    * renames (the same tmp-then-swap discipline as [[compact]]). The
    * aside dir lives OUTSIDE the table root — an aside left inside by
    * a crash in the swap window would parse as a real hive partition
    * and resurrect the old rows under a corrupted partition value on
    * every subsequent read. Staging dir names carry a random
    * per-invocation suffix so a racing retry cannot delete a live
    * invocation's staging data; the swap window itself is still
    * single-writer (two concurrent upserts of the SAME partition can
    * interleave renames — that last-writer race is the usual
    * non-transactional-lake caveat, closed only by a commit-protocol
    * table format). At 100 TB, a daily upsert touching 1% of
    * partitions costs 1% of the table in IO, not a rewrite — and a
    * crash before the swap leaves the live table untouched.
    *
    * Returns the number of partitions rewritten (or created).
    */
  /** Per-record text-file sink with idempotent resume: one `<id>.txt`
    * per input row — the reference converter's actual output contract
    * (convert_json_to_text.py:150 `save_text_file`, one text file per
    * input JSON, named by the input's stem) — plus the skip-existing
    * resume its directory loop implies: records whose output file
    * already exists are NOT rewritten, so a re-run after a partial
    * failure finishes only the remaining records.
    *
    * Scale shape: ONE driver-side directory listing (the same listing
    * any resume check needs) feeds a distributed anti-join — records
    * are never enumerated on the driver — and the files are written
    * from `foreachPartition` through the Hadoop FileSystem API, so
    * output parallelism is the DataFrame's partitioning and the sink
    * works against any Hadoop-supported store. A million-file output
    * directory is an anti-pattern at 100 TB (use partitioned text or
    * parquet); this sink exists for the reference's per-record
    * contract, typically after a LIMIT or per-batch selection.
    *
    * Rows with a NULL id or text are dropped (counted in neither
    * total), matching the reference's skip-on-failure accounting.
    * Returns (written, skipped).
    */
  def writeTextPerRecord(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, dir: String): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val existing = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".txt")).map(_.stripSuffix(".txt"))
    import spark.implicits._
    val rows = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("string").as("id"), col(textCol).cast("string").as("text"))
    require(rows.groupBy(col("id")).count().filter(col("count") > 1).isEmpty,
      s"writeTextPerRecord: duplicate $idCol values — one file per record requires unique ids")
    val todo = (if (existing.isEmpty) rows
      else rows.join(existing.toDF("id"), Seq("id"), "left_anti"))
      .as[(String, String)].persist()
    try {
      val total = rows.count()
      val nTodo = todo.count()
      val dirStr = root.toString
      // ship the DRIVER's hadoop conf into the task closure — a bare
      // executor-side `new Configuration()` would drop every
      // spark.hadoop.* setting (object-store credentials, custom FS
      // impls) and silently write through defaults
      val serConf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      todo.foreachPartition { (it: Iterator[(String, String)]) =>
        if (it.hasNext) {
          // PRIVATE FS instance (newInstance, not the JVM-cached get):
          // the checksum toggle below must not leak to other users of
          // this scheme in the executor. No client-side .crc sidecars:
          // the output contract is EXACTLY one <id>.txt per record (a
          // ChecksumFileSystem would shadow every file).
          val p = new org.apache.hadoop.fs.Path(dirStr)
          val efs = org.apache.hadoop.fs.FileSystem.newInstance(
            p.toUri, serConf.value)
          try {
            efs.setWriteChecksum(false)
            it.foreach { case (id, text) =>
              val out = efs.create(new org.apache.hadoop.fs.Path(p, s"$id.txt"), true)
              try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            }
          } finally efs.close()
        }
      }
      (nTodo, total - nTodo)
    } finally todo.unpersist()
  }

  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, partCol: String,
      // above this many distinct partition values the prune switches
      // from a literal `isin` to a broadcast semi-join (DPP)
      isInPruneMax: Int = 256): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val u = updates.persist()
    try {
      // ONE validation + partition-list job (round 16; was four
      // actions per batch — null-partition filter, duplicate groupBy,
      // a distinct count AND a distinct collect): one aggregation over
      // the (key, partition) groups yields both guards' evidence and
      // the distinct partition values in a single collected row. Guard
      // messages and precedence unchanged.
      val vrow = u.groupBy(col(keyCol), col(partCol))
        .agg(count(lit(1)).as("c"))
        .agg(
          sum(when(col(partCol).isNull, col("c")).otherwise(lit(0L))).as("n_null_part"),
          max(col("c")).as("max_dup"),
          collect_set(col(partCol)).as("parts"))
        .head()
      require(vrow.isNullAt(0) || vrow.getLong(0) == 0L,
        s"upsert: null $partCol in updates — hive null-partition rows cannot be merged safely")
      require(vrow.isNullAt(1) || vrow.getLong(1) <= 1L,
        s"upsert: update batch has duplicate ($keyCol, $partCol) rows — " +
          "MERGE target ambiguity; resolve duplicates before upserting")
      val partVals = vrow.getSeq[Any](2)
      if (!fs.exists(hPath)) {
        u.write.partitionBy(partCol).parquet(path)
        return partVals.size
      }
      val existing = spark.read.parquet(path)
      val affected =
        if (partVals.size <= isInPruneMax)
          existing.filter(col(partCol).isin(partVals: _*))
        else
          existing.join(broadcast(u.select(col(partCol)).distinct()),
            Seq(partCol), "left_semi")
      // anti-join on BOTH key and partition: the key is scoped to its
      // partition, so only the exact (key, partition) target row dies
      val survivors = affected.join(
        u.select(col(keyCol), col(partCol)), Seq(keyCol, partCol), "left_anti")
      // align column order so unionByName sees identical schemas even if
      // the update frame orders columns differently
      val merged = survivors.unionByName(u.select(affected.columns.map(col).toIndexedSeq: _*))
      val runId = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new org.apache.hadoop.fs.Path(hPath.getParent,
        hPath.getName + "_upsert_tmp_" + runId)
      fs.delete(tmp, true)
      merged.write.partitionBy(partCol).parquet(tmp.toString)
      val aside = new org.apache.hadoop.fs.Path(hPath.getParent,
        hPath.getName + "_upsert_old_" + runId)
      fs.delete(aside, true)
      fs.mkdirs(aside)
      val dirs = fs.listStatus(tmp).filter(st => st.isDirectory && st.getPath.getName.contains("="))
      dirs.foreach { st =>
        val dest = new org.apache.hadoop.fs.Path(hPath, st.getPath.getName)
        val old = new org.apache.hadoop.fs.Path(aside, st.getPath.getName)
        val had = fs.exists(dest)
        if (had && !fs.rename(dest, old))
          throw new java.io.IOException(s"upsert: cannot move $dest aside")
        if (!fs.rename(st.getPath, dest)) {
          if (had && !fs.rename(old, dest))
            throw new java.io.IOException(
              s"upsert: swap of ${st.getPath} failed AND rollback of $old failed — " +
                s"partition ${st.getPath.getName} must be restored from $aside manually")
          throw new java.io.IOException(s"upsert: cannot swap in ${st.getPath}")
        }
      }
      fs.delete(aside, true)
      fs.delete(tmp, true)
      dirs.length
    } finally u.unpersist()
  }
}
