package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Warm up the ENGINE (not the queries): Hadoop FS init, scheduler,
    * whole-stage codegen+janino, and — the big one — C2-compilation of
    * the interpreted expression paths (from_json/get_json_object are
    * CodegenFallback, higher-order lambdas are always interpreted).
    * Cold, those paths run 5-10x slower for the first queries that hit
    * them (measured: etl_sse_parse 12.9s first-ever vs 1.2s warm; at
    * the 100x probe an unwarmed first dedup query paid a ~350s
    * interpreter storm). Standard benchmark practice; uses only
    * synthetic range data. Shared with [[Probe]] so probe "first run"
    * numbers measure per-plan costs, not interpreter compilation.
    */
  private[graft] def warmup(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val w = spark.range(200000).select(col("id"),
      concat(lit("""{"k": """), col("id"), lit(""", "s": "v"}""")).as("js"),
      array_repeat(col("id") % 100, 8).as("arr"))
    w.select(
        get_json_object(col("js"), "$.k").as("k1"),
        from_json(col("js"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING")).as("p"),
        regexp_extract(col("js"), "\\{.*\\}", 0).as("re"),
        expr("transform(arr, x -> x * 2 + 1)").as("t"),
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("agg"),
        md5(col("js")).as("m"), xxhash64(col("js")).as("xx"))
      .write.format("noop").mode("overwrite").save()
    val g = w.select(col("id"), explode(col("arr")).as("k"))
    g.groupBy(col("k")).count()
      .join(g.hint("shuffle_hash"), Seq("k"))
      .write.format("noop").mode("overwrite").save()
    import spark.implicits._
    w.select(col("id"), col("arr")).as[(Long, Seq[Long])]
      .map { case (i, a) => (i, a.sum) }
      .toDF("id", "s")
      .select(col("id"), sum(col("s")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id") % 32).orderBy(col("id"))).as("r"))
      .orderBy(col("r")).limit(10).collect()
    // One tiny pass through the dedup kernels themselves (shingle
    // flatMap → xxhash64 → minhash signature/band vote loop → verify
    // join): the generic map/flatMap warmup above compiles the Dataset
    // plumbing but NOT these kernel classes, and at the 100x probe the
    // first real dedup query still paid a cold-JIT storm (jaccard 156s
    // cold vs ~105s warm). ~2k synthetic docs: milliseconds of work,
    // and the kernels' hot loops reach C2 before any measured query.
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"), pmod(col("id") + i, lit(97)))): _*).as("text"))
    val sh = graft.operators.Dedup.shingleArrays(spark, docs).localCheckpoint()
    graft.operators.Dedup.bandTable(spark, sh)
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    sh.select(col("doc_id"), col("sh").as("sha"))
      .join(sh.select((col("doc_id") + 1).as("doc_id"), col("sh").as("shb")), Seq("doc_id"))
      .select(size(array_intersect(col("sha"), col("shb"))).as("inter"))
      .agg(sum(col("inter"))).collect()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 141 distinct plans x ~2-10 codegen units each blow far past
      // the default 100-entry generated-class cache; iterative
      // queries (dedup_clusters' per-round plans) then evict every
      // later query's classes between passes, and the evictee pays a
      // full janino recompile per pass (measured: q37 4.8s after
      // dedup_clusters vs 2.1s solo). Static conf, set before the
      // session exists. The 1g ReservedCodeCacheSize in build.sbt is
      // the JIT-side half of the same story.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Idle-check preamble (the tools/baseline.py discipline, now
    // enforced rather than documented): the r11 driver window ran
    // +12% hot vs five same-SHA self-measured pairs purely from host
    // load, flipping four borderline rows over their 2x bar. Wait
    // (bounded) for the 1-minute loadavg to settle before timing
    // anything, and disclose both the observed load and the wait in
    // the output line so a hot window is visible in the artifact
    // instead of masquerading as a regression.
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadAtStart = load1()
    var idleWait = 0
    while (load1() > 8.0 && idleWait < 120) { Thread.sleep(5000); idleWait += 5 }
    val loadAtBench = load1()
    warmup(spark)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Two passes over the inventory, report the per-query MIN (JMH-style
    // steady-state): a single pass is a lottery — one-time costs that the
    // generic warmup can't reach (per-PLAN janino compiles, C2 compile
    // storms, a full-GC pause) land on a random query and distort it by
    // 5-10x run-to-run (measured: same query 1.3s vs 20.0s across two
    // single-pass runs). The min of two is the throughput number that
    // actually characterizes the engine.
    // dev-only subset filter (comma-separated names); unset = full inventory
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val order = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def pass(): Seq[(String, Double, Boolean)] = order.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune the projected expression work away entirely).
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Free each query's distributed state (cache() entries and
      // localCheckpoint blocks) once its timing is taken: on the 8 GiB
      // bench heap, 141 queries x 2 passes of never-unpersisted
      // checkpoint blocks stack up to storage-eviction churn that
      // inflated the late-alphabet rows 1.5-3x in-suite vs solo
      // (mm_dedup 1.22s in-suite vs 0.47s solo in BENCH_r07). No
      // query shares distributed state with another by design — the
      // one cross-query cache holding executor blocks is dropped in
      // the same breath (see Similarity.dropDistributedEvalState).
      spark.sharedState.cacheManager.clearCache()
      graft.StateRegistry.sweep(spark)
      graft.operators.Similarity.dropDistributedEvalState()
      // Force reference processing NOW: a checkpoint/shuffle-heavy
      // query (dedup_clusters runs ~10 jobs with per-round
      // checkpoints) leaves hundreds of dead shuffle/RDD/broadcast
      // references whose ContextCleaner processing otherwise fires
      // mid-next-query — measured +2.6s on the following query's
      // broadcast-laden plan (q37). JMH-style between-iteration GC
      // lands that work between timings instead.
      System.gc()
      (name, elapsed, ok)
    }
    // Each pass starts with empty EVALUATION-state caches (ANN ground
    // truth, exact cosine-pair set), so the per-query min still pays
    // that computation once per pass — otherwise pass 2's gate queries
    // would inherit pass 1's ground truth and their min-of-2 numbers
    // would exclude the gates' dominant input entirely. Trained model
    // state (centroids, codebooks, bloom sketch) persists across
    // passes by design; see Similarity.resetEvalCaches.
    // clearCache: queries that cache() intermediate state (q37's edge
    // list) must re-pay the build in pass 2 — same honesty rule as
    // resetEvalCaches. RDD-level localCheckpoints (Similarity's
    // exactPairCache) are NOT cacheManager entries and survive, as
    // designed.
    // THREE passes (min-of-3, up from min-of-2 in r11): with two
    // passes a single one-time cost landing in each pass's copy of the
    // same query — or one hot-host window overlapping both — still
    // distorts the min; the r11 driver window showed exactly that
    // (q50 3.96s in-driver vs 1.6-1.8s in five same-SHA local pairs).
    // The third pass costs ~1 warm suite (~100s) and makes the min a
    // genuine steady-state number.
    def timedPass(): Seq[(String, Double, Boolean)] = {
      graft.operators.Similarity.resetEvalCaches()
      spark.sharedState.cacheManager.clearCache()
      pass()
    }
    val p1 = timedPass()
    val p2 = timedPass()
    val p3 = timedPass()
    val results = p1.zip(p2).zip(p3).map {
      case (((n, t1, ok1), (_, t2, ok2)), (_, t3, ok3)) =>
        (n, math.min(t1, math.min(t2, t3)), ok1 && ok2 && ok3)
    }
    // failed queries report -1 and are excluded from the total, so a
    // broken query can't silently skew the benchmark. Timings are rounded
    // to 3 decimals: the driver captures only an output tail, and full
    // nano precision pushed the JSON line past its window (round 1's
    // bench line was truncated mid-line and failed to parse).
    def fmt(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) fmt(v) else "-1") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // methodology disclosure: "value" is the per-query min of two
    // passes (JMH-style steady state; see the pass() comment).
    // "pass1_total" is the first full cold-ish pass so the two
    // regimes stay separately comparable across rounds.
    val p1total = p1.collect { case (_, v, true) => v }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","method":"min-of-3-passes","pass1_total":${fmt(p1total)},"load_at_start":${fmt(loadAtStart)},"load_at_bench":${fmt(loadAtBench)},"idle_wait_s":$idleWait,"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only the LAST ~2000 chars of output; the
    // full per-query line above exceeds that, so its front is cut and
    // the driver's {"metric"...} extraction found no parseable object
    // for two rounds (BENCH_r04/r05 "parsed": null). Emit a compact
    // headline line LAST: it fits the tail window whole, and because
    // the full line's own "metric" prefix is what gets truncated away,
    // the first {"metric" occurrence in the tail is this parseable
    // one. Per-query detail remains in the full line + bench_out.json.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","method":"min-of-3-passes","n_queries":${results.size},"n_failed":${results.count(!_._3)},"failed":$failed,"load_at_bench":${fmt(loadAtBench)},"detail":"bench_out.json","sf":"$sfDir"}""")
    // Also persist to disk: the driver captures only a bounded output tail,
    // which destroyed 9 query rows of the round-3 artifact. The on-disk copy
    // is the authoritative record — so a SPARK_GRAFT_ONLY dev-subset run
    // writes to a suffixed file instead, and can never overwrite the
    // authoritative full-inventory artifact with a partial total.
    val benchFile = if (only.isDefined) "bench_out_subset.json" else "bench_out.json"
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(benchFile),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] $benchFile write failed: ${e.getMessage}") }
    // Same-window manifest: tools/baseline.py writes the twin
    // baseline_manifest.json and tools/check.py warns when the two
    // snapshots drift (different commit, or generated hours apart) —
    // a bench/baseline ratio is only meaningful when both sides were
    // produced back-to-back on the same tree and host load.
    if (only.isEmpty) {
      val sha =
        try scala.sys.process.Process(Seq("git", "rev-parse", "HEAD")).!!.trim
        catch { case _: Throwable => "unknown" }
      // the guard keys on the src/ TREE hash, not the commit SHA: a
      // docs/allowlist-only commit between the two runs doesn't change
      // the measured engine, so it must not invalidate the pair
      val srcTree =
        try scala.sys.process.Process(Seq("git", "rev-parse", "HEAD:src")).!!.trim
        catch { case _: Throwable => "unknown" }
      // escape interpolated values: a sfDir (or sha fallback) with a
      // quote/backslash would otherwise emit invalid JSON and crash
      // tools/check.py's manifest parse
      def jesc(s: String): String =
        s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => "\\u%04x".format(c.toInt)
          case c => c.toString
        }
      val manifest =
        s"""{"git_sha":"${jesc(sha)}","src_tree":"${jesc(srcTree)}","generated_unix":${System.currentTimeMillis / 1000},"sf":"${jesc(sfDir)}"}"""
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_manifest.json"),
        (manifest + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] manifest write failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
