package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.9 — training-data curation operators over the documents table:
  * the operations a large-scale LLM-pretraining pipeline runs between
  * raw crawl and tokenized shards, beyond dedup/similarity (§2.3/§2.4).
  *
  * Same engine posture as the rest of the library: every operator is a
  * declarative DataFrame pipeline (no UDFs), candidate generation is
  * always a key-equality join or a window — never a cross product —
  * and per-document work stays map-side. The only shuffles are the
  * aggregations/windows that genuinely need co-location (term counts,
  * per-language packing), all of which partition on high-cardinality
  * or bounded-cardinality keys.
  */
object Curation {

  /** numShufflePartitions-sized repartition: a materialization barrier
    * before exploding lambda-produced arrays (higher-order functions
    * are interpreted; a Generate consuming them directly re-evaluates
    * the lambda per exploded row), and parallelism insurance for the
    * single-split local parquet files.
    */
  private def barrier(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))

  // ------------------------------------------------------------------
  // PII redaction.
  // ------------------------------------------------------------------

  private val UrlRe = "https?://[^ ]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private val PhoneRe = "\\+1-555-\\d{4}"

  /** Regex PII redaction (emails, SSNs, phone numbers, URLs → typed
    * placeholder tokens) plus a per-document match count. The PII is
    * synthesized deterministically onto the corpus so every pattern
    * branch is exercised; patterns are applied URL-first so an email
    * inside a URL can't be half-redacted. Pure regexp_replace chain —
    * codegen'd, map-side only, no shuffle.
    *
    * The eight regex passes are projected ABOVE the final sort: a
    * global sort's range exchange SAMPLES its child to pick partition
    * bounds, so any expensive projection below the sort is evaluated
    * twice (once by the sampler, once by the exchange map side).
    * Sorting the cheap (doc_id, raw) rows first and applying the
    * regexes after the exchange runs them exactly once — measured
    * 0.91s → 0.53s warm at sf0.1, and the same 2× applies to the
    * sampling pass at any scale.
    */
  def curPiiRedact(s: SparkSession, d: String): DataFrame = {
    val id4 = lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
    val raw = concat(
      lit("contact user"), col("doc_id"), lit("@example.com"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" ssn 123-45-"), id4)).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit(" call +1-555-"), id4)).otherwise(lit("")),
      lit(" via https://ex.com/d/"), col("doc_id"), lit(" :: "), col("text"))
    def countRe(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), UrlRe, "[URL]"),
              EmailRe, "[EMAIL]"),
            SsnRe, "[SSN]"),
          PhoneRe, "[PHONE]").as("redacted"),
        (countRe(col("raw"), UrlRe) + countRe(col("raw"), EmailRe) +
          countRe(col("raw"), SsnRe) + countRe(col("raw"), PhoneRe)).as("n_pii"))
  }

  // ------------------------------------------------------------------
  // Test-set decontamination.
  // ------------------------------------------------------------------

  /** Distinct word 5-gram array of `toks` (decontamination shingles —
    * longer than the dedup 3-grams so membership means a real phrase
    * match, not vocabulary overlap).
    */
  private[graft] val FiveGramExpr =
    """array_distinct(CASE WHEN size(toks) < 5 THEN cast(array() AS array<string>)
      |ELSE transform(sequence(1, size(toks) - 4),
      |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
      |       element_at(toks, i + 2), element_at(toks, i + 3), element_at(toks, i + 4)))
      |END)""".stripMargin

  /** Benchmark decontamination: flag training documents sharing any
    * word 5-gram with the held-out set (docs with doc_id % 20 == 0
    * stand in for the benchmark). Inverted-index shape: the eval
    * n-gram set is distinct'd and broadcast (benchmarks are tiny
    * relative to a training corpus), training shingles stream past it
    * map-side — no shuffle of the corpus at all.
    */
  def curDecontaminate(s: SparkSession, d: String): DataFrame = {
    val grams = barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(explode(col("g5")).as("g")).distinct()
    grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .select(col("doc_id"), explode(col("g5")).as("g"))
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"),
        when(col("n_overlap") > 0, 1L).otherwise(0L).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** The eval-side contamination report — the complement of
    * [[curDecontaminate]]: for each HELD-OUT document, how many
    * training documents share at least one of its 5-grams. This is
    * the report the benchmark owner needs (which eval items are
    * compromised and how broadly), where decontaminate is the report
    * the training side needs. Same broadcast discipline: the tiny
    * eval gram set is the build side of an inner join the training
    * stream passes once; per-eval-doc distinct-train counts aggregate
    * on the eval key (benchmark-sized), and a final dimension join
    * restores zero-hit eval docs. The corpus never shuffles.
    */
  def curEvalOverlap(s: SparkSession, d: String): DataFrame = {
    val grams = barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
    val ev = grams.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("doc_id").as("eval_doc"), explode(col("g5")).as("g"))
    val tr = grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .select(col("doc_id").as("train_doc"), explode(col("g5")).as("g"))
    val hits = tr.join(broadcast(ev), Seq("g"))
      .groupBy(col("eval_doc"))
      .agg(countDistinct(col("train_doc")).as("n_train_docs"))
    // size(g5) > 0: an eval doc with <5 tokens has no 5-gram surface
    // to overlap on and is out of scope for the report — and the
    // unnest-based oracle drops such docs before its LEFT JOIN, so
    // restoring them here would diverge on any corpus containing one.
    grams.filter(pmod(col("doc_id"), lit(20)) === 0)
      .filter(size(col("g5")) > 0)
      .select(col("doc_id").as("eval_doc"))
      .join(broadcast(hits), Seq("eval_doc"), "left")
      .select(col("eval_doc").as("doc_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        when(coalesce(col("n_train_docs"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("compromised"))
      .orderBy(col("doc_id"))
  }

  /** Memorization / inclusion audit bar: an eval item with at least
    * this fraction of its distinct 5-grams present in the training
    * corpus is flagged memorized. */
  val NoveltyMemorizedBar = 0.5

  /** Memorization / inclusion audit (the Carlini-style screen; the
    * third view of the overlap triangle after [[curDecontaminate]]
    * (training side: drop overlapping TRAIN docs) and
    * [[curEvalOverlap]] (benchmark side: how many train docs touch
    * each eval item)): for each held-out/generated document, the
    * fraction of its DISTINCT 5-grams found anywhere in the training
    * corpus — `hit_frac` — and its complement `novelty`. A generated
    * sample with high hit_frac is training data replayed, not
    * generalization; model-eval pipelines run exactly this report
    * over model outputs before trusting a benchmark number.
    *
    * Scale shape: the audited set is benchmark-sized, so its distinct
    * gram set broadcasts; the training corpus passes ONCE map-side
    * through a left-semi join against that broadcast (the
    * [[curDecontaminate]] discipline) and collapses to the ≤
    * |eval grams| distinct grams it actually contains — the corpus
    * never shuffles and nothing corpus-sized aggregates. Per-doc
    * counts then aggregate on the benchmark-sized key.
    */
  def curNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
    val ev = grams.filter(pmod(col("doc_id"), lit(20)) === 0)
      .filter(size(col("g5")) > 0)
      .select(col("doc_id"), explode(array_distinct(col("g5"))).as("g"))
    // distinct training grams that are ALSO eval grams — bounded by
    // the eval gram count, never corpus-sized
    val hitGrams = grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .select(explode(col("g5")).as("g"))
      .join(broadcast(ev.select(col("g")).distinct()), Seq("g"), "left_semi")
      .distinct()
    ev.join(broadcast(hitGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("hit_frac"),
        round(lit(1.0) - col("n_hit").cast("double") / col("n_grams"), 6).as("novelty"),
        (round(col("n_hit").cast("double") / col("n_grams"), 6) >= NoveltyMemorizedBar)
          .cast("long").as("memorized"))
      .orderBy(col("doc_id"))
  }

  /** Decontamination with a SHUFFLED (not broadcast) eval set: the
    * fallback for when the held-out corpus is itself too large to
    * broadcast (e.g. decontaminating against another full training
    * split, not a benchmark). Identical semantics and oracle to
    * [[curDecontaminate]]; the membership probe is a bucketed join on
    * the gram key — both sides hash-partition on `g`, so no executor
    * ever holds the whole eval set.
    *
    * The training stream is PREFILTERED map-side through the shared
    * eval-gram bloom sketch ([[evalGramBloom]], constant-size model
    * state) before the shuffle: the vast majority of training grams
    * are misses, so only probable-hit grams — true hits plus a
    * vanishing FP fraction — ever reach the exchange, and the exact
    * gram-equality join then adjudicates the false positives.
    * Semantics are unchanged (no false negatives in a bloom probe);
    * shuffled volume drops by roughly the miss rate (~99% at the test
    * SFs, and the bigger the training/eval asymmetry the bigger the
    * win — exactly the 100 TB regime). Docs whose grams all miss are
    * restored by a left join of the per-doc hit counts back onto the
    * one-row-per-doc training table (corpus-sized on both sides at
    * scale, hence sort-merge, not broadcast).
    */
  def curDecontaminateShuffle(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomSketch
    val grams = barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(explode(col("g5")).as("g")).distinct()
    val bfRef = org.apache.spark.sql.GraftColumnBridge.scalarSubquery(evalGramBloom(s, d))
    val train = grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val hits = train
      .select(col("doc_id"), explode(col("g5")).as("g"))
      .filter(BloomSketch.mightContain(bfRef, xxhash64(col("g"))))
      .join(evalGrams.hint("shuffle_hash"), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    train.select(col("doc_id"))
      .hint("merge")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1L).otherwise(0L).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-filter capacity for [[curDecontaminateBloom]]: 1 MiB of
    * bits against ~10⁴ distinct eval grams at test SFs ⇒ ~29 hash
    * functions and a false-positive rate around 1e-40 — effectively
    * zero over the ~10⁵ probes, so the deterministic result equals
    * the exact variant's and shares its oracle. At a real 100 TB
    * deployment numBits scales with the eval-set size (1.44·n·log2(1/p)
    * bits for FP rate p) and stays megabytes where the exact gram set
    * would be gigabytes.
    */
  val BloomEstItems = 200000L
  val BloomNumBits: Long = 8L * 1024 * 1024

  /** Built eval-gram bloom sketches, keyed by (application, dataset):
    * the sketch is deterministic fitted MODEL state — a pure function
    * of the eval split and the (items, bits) configuration — so every
    * consumer ([[curDecontaminateBloom]]'s probe, the
    * [[curDecontaminateShuffle]] prefilter) must share one build
    * rather than re-aggregating the eval corpus per query, exactly as
    * [[Similarity.kmeansCentroids]] shares its trained quantizer. The
    * cached value is the one-row aggregate materialized via
    * localCheckpoint (a numBits/8-byte cell in block storage), which
    * consumers reference as a scalar subquery — the sketch bytes stay
    * OUT of the plan text (no megabyte literal re-hashed with every
    * task), and the checkpoint makes the subquery stage a single
    * cached-row scan. Deterministic build ⇒ caching cannot change any
    * result.
    */
  private val bloomCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private[graft] def evalGramBloom(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomSketch
    bloomCache.getOrElseUpdate((s.sparkContext.applicationId, d), {
      Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(20)) === 0)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(explode(col("g5")).as("g")).distinct()
        .agg(BloomSketch.bloomAgg(xxhash64(col("g")), BloomEstItems, BloomNumBits).as("bf"))
        // registered checkpoint: shared model state must survive
        // Bench's per-query storage sweep (see graft.StateRegistry)
        .transform(df => graft.StateRegistry.checkpointed("evalGramBloom", df))
    })
  }

  /** Decontamination via a broadcast BLOOM FILTER of the eval grams —
    * the production shape when even the distinct eval-gram set is too
    * big to ship: [[graft.functions.BloomSketch.bloomAgg]] compresses
    * it to [[BloomNumBits]] bits (one binary cell), and membership
    * becomes a codegen'd map-side probe on the training stream — no
    * join at all, broadcast size independent of gram count. Same
    * output and oracle as [[curDecontaminate]] (the FP rate is chosen
    * so no probe can realistically flip).
    */
  def curDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomSketch
    val grams = barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
    // The sketch feeds the probe as a SCALAR SUBQUERY — the exact
    // construct Spark's own injected runtime join filters use
    // (might_contain requires a constant or scalar-subquery filter
    // side) — over the SHARED cached build ([[evalGramBloom]]): a
    // constant numBits/8 bytes regardless of corpus size, i.e.
    // bounded model state like the IVF centroid matrix, built once
    // per (application, dataset) and never embedded in plan text.
    val bfRef = org.apache.spark.sql.GraftColumnBridge.scalarSubquery(evalGramBloom(s, d))
    grams.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .select(col("doc_id"), explode(col("g5")).as("g"))
      .groupBy(col("doc_id"))
      .agg(sum(when(BloomSketch.mightContain(bfRef, xxhash64(col("g"))), 1L)
        .otherwise(0L)).as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"),
        when(col("n_overlap") > 0, 1L).otherwise(0L).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Repetition / quality signals (Gopher-style).
  // ------------------------------------------------------------------

  /** Gopher-style repetition signals per document: most-frequent-token
    * fraction, top-2-gram fraction, duplicate-3-gram fraction, and the
    * keep/drop verdict at corpus-calibrated thresholds.
    *
    * Gram counting is purely doc-local, so it runs as one tight typed
    * pass per document — NO shuffle of the exploded gram stream.
    * (Previous form: explode tokens+2grams+3grams into a corpus-wide
    * groupBy(doc, gram) — correct, but it shuffles ~3 tokens-worth of
    * strings per document; at 100 TB that is a full-corpus reshuffle
    * for an embarrassingly parallel statistic. The kernel keeps the
    * whole computation map-side; measured ~3.1s → ~0.4s warm at
    * sf0.1.) All ratios are exact-integer divisions in double, so the
    * values are bit-reproducible across engines without rounding.
    */
  def curRepetition(s: SparkSession, d: String): DataFrame =
    repetitionKernel(s, d)
      // lazy checkpoint before the sort: the range exchange's sampling
      // pass materializes it (instead of re-running the whole
      // gram-counting kernel) and the exchange reuses; eager = false
      // so constructing/explaining the query runs nothing.
      .localCheckpoint(eager = false)
      .orderBy(col("doc_id"))

  /** The unsorted per-document repetition stats ([[curRepetition]]
    * without the presentation sort — what composing pipelines like
    * [[curKeepList]] consume).
    */
  private[graft] def repetitionKernel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // barrier = split-parallelism for the single-file local scan; at
    // cluster scale the scan itself provides the splits.
    barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), col("toks")))
      .as[(Long, Seq[String])]
      .flatMap { case (id, toksSeq) =>
        val toks = toksSeq.toArray
        val n1 = toks.length
        if (n1 == 0) Iterator.empty
        else {
          val c1 = new java.util.HashMap[String, Int]()
          val c2 = new java.util.HashMap[String, Int]()
          val d3set = new java.util.HashSet[String]()
          var i = 0
          while (i < n1) {
            c1.merge(toks(i), 1, Integer.sum _)
            if (i + 1 < n1) c2.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum _)
            if (i + 2 < n1) d3set.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
            i += 1
          }
          def maxV(m: java.util.HashMap[String, Int]): Int = {
            var mx = 0
            val it = m.values().iterator()
            while (it.hasNext) { val v = it.next(); if (v > mx) mx = v }
            mx
          }
          val n2 = math.max(n1 - 1, 0)
          val n3 = math.max(n1 - 2, 0)
          val f1 = maxV(c1).toDouble / n1
          // single-token / two-token docs have no 2-grams / 3-grams:
          // the fraction is undefined (null), and keep stays 0 — same
          // as the previous SQL (null comparisons fall to otherwise).
          val f2 = if (n2 > 0) Some(maxV(c2).toDouble / n2) else None
          val f3 = if (n3 > 0) Some((n3 - d3set.size).toDouble / n3) else None
          val keep =
            if (f1 <= 0.11 && f2.exists(_ <= 0.05) && f3.exists(_ <= 0.1)) 1L else 0L
          Iterator.single((id, f1, f2, f3, keep))
        }
      }
      .toDF("doc_id", "max_tok_frac", "top_2gram_frac", "dup_3gram_frac", "keep")
  }

  // ------------------------------------------------------------------
  // Sliding-window chunking.
  // ------------------------------------------------------------------

  val ChunkSize = 32
  val ChunkStride = 16

  /** Context-window chunking: split each document into token windows
    * of [[ChunkSize]] with [[ChunkStride]] overlap (the shape used to
    * cut long documents into training sequences). The window starts
    * come from a codegen'd `sequence` + `slice` — no interpreted
    * lambda anywhere, so the Generate is safe without a barrier; the
    * repartition is only split-parallelism for the local single-file
    * scan.
    */
  def curChunk(s: SparkSession, d: String): DataFrame = {
    val nt = size(col("toks"))
    val nChunks = when(nt <= ChunkSize, lit(1L))
      .otherwise(ceil((nt - ChunkSize).cast("double") / ChunkStride) + 1L)
    barrier(s,
      Tables.documents(s, d)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("toks"),
          (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize)), " ").as("chunk_text"),
        size(slice(col("toks"),
          (col("chunk_id") * ChunkStride + 1).cast("int"), lit(ChunkSize))).cast("long")
          .as("n_chunk_tokens"))
      // LAZY checkpoint before the sort, NOT a hoisted projection: the
      // sampling pass then reads sliced chunk rows — O(ChunkSize) per
      // chunk — whereas projecting the slice above the sort would ship
      // the FULL toks array once per chunk row through the exchange,
      // O(tokens²/stride) bytes for a long document. Lazy (eager =
      // false) so constructing/explaining the query runs nothing; the
      // sort's sampling pass materializes it and the exchange reuses.
      .localCheckpoint(eager = false)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // ------------------------------------------------------------------
  // Stratified (language-balanced) sampling.
  // ------------------------------------------------------------------

  /** Deterministic language-balanced downsampling: the sample key is
    * the first md5 byte of the doc id (uniform on [0, 256)), compared
    * against a per-language keep threshold — 20% for the
    * over-represented `en`, 50% for the rest. Hash-based Bernoulli
    * sampling is reproducible across runs/engines and needs no state,
    * which is what a 100 TB pipeline wants (no global shuffle, pure
    * map-side filter).
    */
  def curSampleStratified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("sample_key", substring(md5(col("doc_id").cast("string")), 1, 2))
      .filter(col("sample_key") <=
        when(col("lang") === "en", lit("33")).otherwise(lit("7f")))
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // Deterministic, leakage-safe train/val/test split.
  // ------------------------------------------------------------------

  val SplitTrainPct = 80
  val SplitValPct = 10 // test = the remaining 10

  /** Deterministic train/val/test assignment, keyed by CONTENT hash:
    * bucket = 48-bit md5 prefix of the text modulo 100, cut at
    * [[SplitTrainPct]] / +[[SplitValPct]] — so (a) the split is
    * reproducible across runs and engines with no stored state,
    * (b) growing the corpus never reassigns an existing document
    * (hash of the row, not of its position or a global count), and
    * (c) EXACT DUPLICATES always land in the same split: hashing
    * doc_id instead would scatter a duplicated document across
    * train and test — the classic evaluation-leakage bug this
    * operator exists to prevent. Pure map-side assignment; the only
    * exchange is the gate's deterministic output sort.
    */
  def curSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long"), lit(100L)))
      .withColumn("split",
        when(col("bucket") < SplitTrainPct, lit("train"))
          .when(col("bucket") < SplitTrainPct + SplitValPct, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("source"), col("lang"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // In-engine quality-classifier training (distributed GD).
  // ------------------------------------------------------------------

  /** Gradient-descent iterations / learning rate / the per-iteration
    * weight rounding that makes the fit engine-portable (see below).
    */
  val LrIters = 3
  val LrRate = 1.0
  val LrSyncScale = 9

  /** TRAIN the quality/language classifier in-engine: batch
    * gradient-descent logistic regression over the whole corpus —
    * the fit side of [[curQualityWeights]]' apply side, and the way a
    * 100 TB pipeline actually produces its fastText-style filter
    * weights (each GD step is one full-corpus pass; nothing but the
    * weight vector ever leaves the executors). Features are the
    * engine's own quality signals (length score, stopword ratio,
    * distinct-token ratio) plus an intercept; the label is the
    * deterministic `lang = 'en'` flag (stopword ratio IS the en
    * signal, so the fit is meaningful, not noise).
    *
    * Scale shape: [[LrIters]] iterations × ONE map-side-partial
    * aggregation each (4 avg's over a projected 4-double frame,
    * checkpointed once so the text tokenization doesn't re-run per
    * pass); the weight vector is bounded model state collected to the
    * driver and embedded as plan literals — exactly the
    * centroid/codebook convention. Engine portability: float
    * aggregation order differs across engines at the ulp level, so
    * each iteration's weights are rounded to [[LrSyncScale]] decimals
    * (~1e-9, five orders above the ~1e-14 summation jitter) before
    * they enter the next iteration — both engines walk the identical
    * weight trajectory and the DuckDB oracle replays the whole fit
    * with three unrolled CTE iterations. Output: one row of final
    * weights + training accuracy, rounded to 6 decimals.
    */
  def curQualityLrFit(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        least(col("n_chars") / 500.0, lit(1.0)).as("x1"),
        (expr("size(filter(toks, t -> t IN ('the', 'a')))").cast("double")
          / size(col("toks"))).as("x2"),
        (size(array_distinct(col("toks"))).cast("double")
          / size(col("toks"))).as("x3"))
      .localCheckpoint()
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3")
    def p = lit(1.0) / (lit(1.0) + exp(-z))
    for (_ <- 1 to LrIters) {
      val g = base.agg(
        avg(p - col("y")).as("g0"),
        avg((p - col("y")) * col("x1")).as("g1"),
        avg((p - col("y")) * col("x2")).as("g2"),
        avg((p - col("y")) * col("x3")).as("g3")).collect()(0)
      w = Array.tabulate(4)(j =>
        BigDecimal(w(j) - LrRate * g.getDouble(j))
          .setScale(LrSyncScale, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    base.agg(avg((when(p >= 0.5, 1.0).otherwise(0.0) === col("y"))
        .cast("double")).as("acc"))
      .select(
        lit(BigDecimal(w(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .as("w_intercept"),
        lit(BigDecimal(w(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .as("w_len_score"),
        lit(BigDecimal(w(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .as("w_stop_ratio"),
        lit(BigDecimal(w(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .as("w_uniq_ratio"),
        round(col("acc"), 6).as("train_accuracy"))
  }

  // ------------------------------------------------------------------
  // Global shuffle + sharding (training order).
  // ------------------------------------------------------------------

  /** Training shards (file count a real run writes per epoch). */
  val NumShards = 8

  /** Deterministic GLOBAL SHUFFLE into training shards — the step
    * every pretraining pipeline runs last: neighboring documents in
    * crawl order are correlated (same site, same day), so training
    * consumption must be a uniform random permutation, yet the
    * permutation must be REPRODUCIBLE (restart a run, get the same
    * data order). Both come from one hash: the 48-bit md5 prefix of
    * the doc id is the shuffle key; `shard = key % NumShards` places
    * each doc, `pos = row_number` over (key, doc_id) within the shard
    * orders it. Scale shape: ONE exchange on the shard id and a
    * within-shard sort — exactly the shard-file write pattern (each
    * shard is one sorted output stream); no global sort, no driver
    * state, and the permutation quality is the hash's uniformity.
    */
  def curShardShuffle(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(NumShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  // ------------------------------------------------------------------
  // Source mixing (data-mixture rebalancing).
  // ------------------------------------------------------------------

  /** Source-mixture rebalancing: downsample every source to the TOKEN
    * budget of the smallest source, so the retained corpus is
    * source-balanced by volume (the knob a pretraining data mix
    * actually turns — token share, not document share). The keep rate
    * is computed FROM the data: per-source token totals are one
    * bounded aggregation (map-side partial over at most |sources|
    * keys), the global minimum is a scalar, and the per-source keep
    * bar is the integer `min_tokens * 256 DIV src_tokens` compared
    * against the first md5 byte of the doc id — the same
    * engine-portable hash-Bernoulli trick as [[curSampleStratified]],
    * so the sample is deterministic, reproducible across engines, and
    * applied as a pure map-side filter. The rate table is a genuine
    * dimension (|sources| rows), so broadcasting it is the correct
    * 100 TB shape — the corpus itself never shuffles.
    */
  def curMixSources(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val per = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    // the global min over the |sources|-row aggregate comes from an
    // empty-partition window (the frame is dimension-sized, so the
    // single-reducer window is bounded) — not a scalar cross join,
    // which plans as a nested-loop and trips the inventory sweep.
    val rates = per
      .withColumn("min_tokens",
        min(col("src_tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("source"), expr("min_tokens * 256 DIV src_tokens").as("keep_bar"))
    docs.join(broadcast(rates), "source")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long") < col("keep_bar"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Cross-document duplicated-n-gram fraction.
  // ------------------------------------------------------------------

  /** Cross-document duplication signal (the RefinedWeb/Gopher
    * "duplicated n-gram fraction" family, measured ACROSS documents
    * rather than within one): for every document, the fraction of its
    * distinct 3-gram shingles that also appear in at least one other
    * document. Complements [[curRepetition]] (within-doc) and the
    * §2.3 pair-level dedup: a high `dup_frac` with no qualifying
    * near-dup pair is exactly the boilerplate-heavy document a
    * curation pass wants to score.
    *
    * Reuses the dedup inverted index: one exchange on the shingle key
    * (the same count window [[Dedup.withDocFreq]] uses), one
    * aggregation back on the doc id — no self-join, no corpus
    * broadcast; cost is strictly below the jaccard pipeline that
    * already runs on this corpus.
    */
  def curDupNgramFrac(s: SparkSession, d: String): DataFrame = {
    // two consumers of the lambda-built shingle table (sizes + the
    // exploded index) — materialize once, same reasoning as
    // dedupNgramJaccard.
    val sh = Dedup.shingled(s, d).localCheckpoint()
    // hashed 8-byte index keys, not gram strings — same rationale and
    // collision math as dedupNgramJaccard's index
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s_str"))
      .select(col("doc_id"), xxhash64(col("s_str")).as("s"))
    val dup = Dedup.withDocFreq(ex).filter(col("df") >= 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      // merge, not broadcast/shuffle_hash: both sides are per-document
      // tables (corpus-sized at 100 TB) and Catalyst cannot size the
      // checkpointed side.
      .hint("merge")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_shingles") > 0,
          round(coalesce(col("n_dup"), lit(0L)) / col("n_shingles"), 4)).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // TF-IDF top terms.
  // ------------------------------------------------------------------

  /** Per-document top-3 TF-IDF terms. Term frequency is doc-local, so
    * it comes from one tight typed pass per document — the exploded
    * token stream never hits a shuffle (the previous
    * explode + groupBy(doc, term) form shuffled every raw token
    * occurrence in the corpus just to count in-document duplicates;
    * the kernel collapses them map-side, same reasoning as
    * [[curRepetition]] — measured ~1.5s → ~0.6s warm at sf0.1).
    * df comes from a count window OVER the tf stream itself
    * (partitioned on the term), so the tf frame has exactly ONE
    * consumer and the whole query is one linear job — no checkpoint
    * materialization, no df self-join. (Previous form: checkpoint the
    * tf frame, aggregate df, join it back — identical values, but it
    * paid a checkpoint job plus a join exchange; at sf0.1 the query's
    * cost was four scheduled stages × Spark's ~0.3s dispatch floor,
    * 2.6× the oracle. The window form pays kernel → term exchange →
    * doc exchange → output sort.) n_docs is a driver-side parquet
    * footer count ([[Tables.parquetRowCount]]) folded in as a literal
    * — the same metadata-only count(*) the DuckDB oracle performs; a
    * Spark scan-and-aggregate job for one scalar would pay two extra
    * stage dispatches to recompute what the footers already record.
    * Ranking is a per-doc window over ≤ |vocab| rows. The output
    * total order (doc_id, rank) is produced by a single-reducer sort
    * of the 3·n_docs result rows rather than a range-partitioned
    * orderBy: the result is presentation-sized (top-3 per doc), and a
    * global orderBy would pay a range-boundary sampling pass that
    * re-executes the ranking stage. (At cluster scale with billions
    * of docs, swap the repartition(1) for repartitionByRange on
    * doc_id — the sort key is already the layout key.) Scores are
    * rounded to 4 decimals and tie-broken on the term so the ordering
    * is reproducible. The tokenizer is split-on-single-space keeping
    * empties — exactly DuckDB's `string_split(text, ' ')`, which the
    * oracle uses.
    */
  def curTfidfTopterms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tf = barrier(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val m = new java.util.HashMap[String, Long]()
        text.split(" ", -1).foreach(t => m.merge(t, 1L, java.lang.Long.sum _))
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.map(e => (id, e.getKey, e.getValue))
      }
      .toDF("doc_id", "term", "tf")
    val nDocs = Tables.parquetRowCount(s, d, "documents")
    val wDf = Window.partitionBy(col("term"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wDf))
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .repartition(1).sortWithinPartitions(col("doc_id"), col("rank"))
  }

  // ------------------------------------------------------------------
  // Sequence packing.
  // ------------------------------------------------------------------

  val PackWindow = 128

  /** Pack shards per language: each (lang, shard) packs its own bins
    * independently, so the running-sum window's partition count is
    * languages × [[NumPackShards]] — cardinality the engine controls,
    * not the data. Fixed (not ∝ cluster) so the DuckDB oracle can
    * replicate the layout; at 100 TB this constant is sized to the
    * cluster (shards ≈ executor slots) and nothing else changes. The
    * shard key is the first md5 byte of the doc id — engine-portable
    * (same trick as [[curSampleStratified]]'s sample key).
    */
  val NumPackShards = 16

  /** Greedy concat-and-split sequence packing: documents are laid out
    * in doc_id order within each (language, shard) and cut into
    * [[PackWindow]]-token bins — each doc's bin and offset fall out of
    * a running-sum window. Two-level sharding keeps the window
    * distributed: a per-language-only partition would sort each
    * language's ENTIRE sub-corpus through one reducer (languages are
    * few), while per-(lang, shard) packing bounds any partition at
    * ~1/[[NumPackShards]] of a language and composes — a bin is
    * globally identified by (lang, shard, bin_id), exactly how real
    * pipelines pack per output shard.
    */
  def curPack(s: SparkSession, d: String): DataFrame = {
    val shard = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("long"),
      lit(NumPackShards.toLong))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        expr(s"cum_before DIV $PackWindow").as("bin_id"),
        pmod(col("cum_before"), lit(PackWindow.toLong)).as("bin_offset"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // End-to-end keep-list.
  // ------------------------------------------------------------------

  /** The full curation pipeline as one query: every document gets a
    * keep/drop verdict with the FIRST failing rule as its reason —
    *  1. `eval_holdout`   — benchmark rows (doc_id % 20 = 0) never train;
    *  2. `exact_dup`      — not the canonical (min doc_id) copy of its
    *                        token-bag content key;
    *  3. `contaminated`   — shares a word-5-gram with the held-out set;
    *  4. `repetitive`     — fails the Gopher-style repetition bars;
    *  5. `ok`             — keep = 1.
    * This is the composition a user of the reference actually runs
    * between crawl and tokenizer.
    *
    * Shape: the three signals are corpus-sized tables keyed by the
    * doc id, so instead of three sort-merge joins (each paying a sort
    * exchange per side) they are UNIONED as sparse (doc_id, signal)
    * rows and folded by ONE hash aggregation on doc_id — the
    * signal-assembly pattern that costs a single exchange regardless
    * of how many signals compose. The canonical-copy signal covers
    * every document (its window spans the corpus), so the aggregate
    * needs no separate spine join. The contamination signal PREFILTERS
    * the training gram stream map-side through the SHARED eval-gram
    * bloom sketch ([[evalGramBloom]]) and then ADJUDICATES the
    * surviving grams against the exact eval-gram set — the same
    * prefilter-then-exact shape as [[curDecontaminateShuffle]], so the
    * verdict stays exact at ANY eval-set size: even if the sketch
    * saturates (eval grams ≫ its fixed capacity) the only cost is a
    * higher FP fraction reaching the adjudication join, never a clean
    * document wrongly dropped. Only the adjudicated contaminated doc
    * ids enter the fold.
    */
  def curKeepList(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomSketch
    val wCanon = Window.partitionBy(col("content_key")).orderBy(col("doc_id"))
    val canon = Tables.documents(s, d)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("content_key", md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))))
      .withColumn("rn", row_number().over(wCanon))
      .select(col("doc_id"), when(col("rn") === 1, 1L).otherwise(0L).as("is_canon"),
        lit(null).cast("long").as("rep_keep"), lit(null).cast("long").as("contaminated"))
    val rep = repetitionKernel(s, d)
      .select(col("doc_id"), lit(null).cast("long").as("is_canon"),
        col("keep").as("rep_keep"), lit(null).cast("long").as("contaminated"))
    val bfRef = org.apache.spark.sql.GraftColumnBridge.scalarSubquery(evalGramBloom(s, d))
    val evalGrams = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(20)) === 0)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("g5", expr(FiveGramExpr))
      .select(explode(col("g5")).as("g")).distinct()
    val dec = barrier(s, Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(20)) =!= 0)
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("g5", expr(FiveGramExpr))
        .select(col("doc_id"), col("g5")))
      .select(col("doc_id"), explode(col("g5")).as("g"))
      .filter(BloomSketch.mightContain(bfRef, xxhash64(col("g"))))
      // exact adjudication of the bloom survivors (false positives
      // out) — both sides already shrunk to probable-hit grams, so
      // the bucketed join moves ~the true-hit volume
      .join(evalGrams.hint("shuffle_hash"), Seq("g"))
      .select(col("doc_id"), lit(null).cast("long").as("is_canon"),
        lit(null).cast("long").as("rep_keep"), lit(1L).as("contaminated"))
    val folded = canon.unionAll(rep).unionAll(dec)
      .groupBy(col("doc_id"))
      .agg(max(col("is_canon")).as("is_canon"), max(col("rep_keep")).as("rep_keep"),
        max(col("contaminated")).as("contaminated"))
    // null-tolerant rule cascade: a doc with no repetition row (empty
    // doc) or no contamination row falls through the rule, matching
    // the oracle's LEFT JOIN semantics
    val reason = when(pmod(col("doc_id"), lit(20)) === 0, "eval_holdout")
      .when(col("is_canon") === 0, "exact_dup")
      .when(col("contaminated") === 1, "contaminated")
      .when(col("rep_keep") === 0, "repetitive")
      .otherwise("ok")
    folded
      .select(col("doc_id"), reason.as("reason"),
        when(reason === "ok", 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  // Gopher-style document-quality rule bounds (Rae et al. 2021,
  // "Scaling Language Models: ... Gopher", Appendix A quality
  // heuristics — word-count window, mean-word-length window, stopword
  // presence, alphabetic-token fraction, symbol-to-word ratio).
  val GopherMinWords = 10
  val GopherMaxWords = 100000
  val GopherMinWordLen = 2.0
  val GopherMaxWordLen = 12.0
  val GopherMinStopHits = 2
  val GopherMinAlphaFrac = 0.8
  val GopherMaxSymbolFrac = 0.1

  private val gopherStops: Seq[String] = TextAnalysis.stopEn ++ TextAnalysis.stopData

  /** Gopher-style quality rule cascade: the five document-level
    * filter rules above, each emitted as its own flag plus the
    * composite `keep` — the per-rule flags are what a pipeline
    * operator reports so a curation run can account for WHY documents
    * were dropped, not just how many. (Within-document repetition,
    * Gopher's other rule family, is already [[curRepetition]].)
    *
    * All signals are integer counts or exact ratios of counts
    * (mean word length is derived from char/word counts, not a float
    * aggregation), so every column is bit-stable across engines. Pure
    * map-side projection — no shuffle at any scale beyond the
    * presentation sort.
    */
  def curGopherRules(s: SparkSession, d: String): DataFrame = {
    val inList = gopherStops.map(w => s"'$w'").mkString(", ")
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mean_wl",
        (length(col("text")) - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("double") / col("n_words"))
      .withColumn("stop_hits",
        expr(s"size(filter(toks, t -> t IN ($inList)))").cast("long"))
      .withColumn("symbol_frac",
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .cast("double") / col("n_words"))
      .withColumn("wc_ok",
        col("n_words").between(GopherMinWords, GopherMaxWords).cast("long"))
      .withColumn("mwl_ok",
        col("mean_wl").between(GopherMinWordLen, GopherMaxWordLen).cast("long"))
      .withColumn("stop_ok", (col("stop_hits") >= GopherMinStopHits).cast("long"))
      .withColumn("alpha_ok", (col("alpha_frac") >= GopherMinAlphaFrac).cast("long"))
      .withColumn("symbol_ok", (col("symbol_frac") <= GopherMaxSymbolFrac).cast("long"))
      .select(col("doc_id"), col("n_words"), col("mean_wl"), col("alpha_frac"),
        col("stop_hits"), col("symbol_frac"), col("wc_ok"), col("mwl_ok"),
        col("stop_ok"), col("alpha_ok"), col("symbol_ok"),
        (col("wc_ok") * col("mwl_ok") * col("stop_ok") * col("alpha_ok")
          * col("symbol_ok")).as("keep"))
  }

  /** END-TO-END curation pipeline with per-document stage attribution
    * — the funnel report a production pretraining pipeline emits so a
    * run can account for WHERE every document went, composing the
    * engine's own stage semantics verbatim: eval holdout (the
    * [[curDecontaminate]] eval set) → Gopher quality rules
    * ([[curGopherRules]]' five checks) → language ID
    * ([[graft.operators.TextAnalysis.textLangid]]'s argmax, target
    * `en`) → exact keep-first dedup (the argmax idiom on md5(text),
    * computed among SURVIVORS of the earlier stages only — a real
    * pipeline dedups what remains, not the raw corpus) → 5-gram
    * decontamination against the holdout. Each document reports the
    * FIRST stage that dropped it, or `kept`.
    *
    * Scale shape: every stage signal is a map-side expression over the
    * barrier repartition (parallelism for the single-file scan); each
    * consumer branch re-reads the columnar scan with ITS stage filters
    * pushed into it (the [[curDecontaminate]] trade — scan-pruned
    * re-reads beat materializing a corpus-sized signal frame), the
    * only content exchange is the keep-first argmax on the content
    * hash (map-side partial absorbs hot duplicate keys; join-back,
    * never a window rank — the Dedup keep-first discipline), and the
    * eval gram set broadcasts (benchmarks are tiny against a training
    * corpus). PlanSpec pins: no Window, no sort-merge join, broadcast
    * decontamination probe.
    */
  def curPipeline(s: SparkSession, d: String): DataFrame = {
    val stopIn = gopherStops.map(w => s"'$w'").mkString(", ")
    val sig = barrier(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mean_wl",
        (length(col("text")) - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("double") / col("n_words"))
      .withColumn("stop_hits", expr(s"size(filter(toks, t -> t IN ($stopIn)))").cast("long"))
      .withColumn("symbol_frac",
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .cast("double") / col("n_words"))
      .withColumn("gopher_keep",
        col("n_words").between(GopherMinWords, GopherMaxWords) &&
          col("mean_wl").between(GopherMinWordLen, GopherMaxWordLen) &&
          col("stop_hits") >= GopherMinStopHits &&
          col("alpha_frac") >= GopherMinAlphaFrac &&
          col("symbol_frac") <= GopherMaxSymbolFrac)
      .withColumn("lang_en",
        TextAnalysis.hitCount(TextAnalysis.stopEn) >= TextAnalysis.hitCount(TextAnalysis.stopSql) &&
          TextAnalysis.hitCount(TextAnalysis.stopEn) >= TextAnalysis.hitCount(TextAnalysis.stopData))
      .withColumn("holdout", pmod(col("doc_id"), lit(20)) === 0)
      .withColumn("th", md5(col("text")))
      .withColumn("g5", expr(FiveGramExpr))
      .select(col("doc_id"), col("holdout"), col("gopher_keep"), col("lang_en"),
        col("th"), col("g5"))
    val qual = sig.filter(!col("holdout") && col("gopher_keep") && col("lang_en"))
    val firsts = qual.groupBy(col("th")).agg(min(col("doc_id")).as("first_id"))
    val evalGrams = sig.filter(col("holdout")).select(explode(col("g5")).as("g")).distinct()
    val contam = qual
      .join(firsts.hint("shuffle_hash"), Seq("th"))
      .filter(col("doc_id") === col("first_id"))
      .select(col("doc_id"), explode(col("g5")).as("g"))
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("hit")).as("n_overlap"))
    sig
      .join(firsts.hint("shuffle_hash"), Seq("th"), "left")
      .join(contam.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("holdout"), "eval_holdout")
          .when(!col("gopher_keep"), "gopher")
          .when(!col("lang_en"), "langid")
          .when(col("doc_id") =!= col("first_id"), "dedup")
          .when(col("n_overlap") > 0, "decontaminated")
          .otherwise("kept").as("drop_stage"))
      .withColumn("kept", (col("drop_stage") === "kept").cast("long"))
      .orderBy(col("doc_id"))
  }

  // Fixed weights for [[curQualityWeights]]: (bias, len_score,
  // 1 - stop_ratio, uniq_ratio, mean_wl / 10). In production these are
  // the trained coefficients of a fasttext-style linear quality
  // classifier; the values here are a deterministic stand-in with the
  // same plumbing.
  val QwBias = -2.0
  val QwLen = 2.0
  val QwStop = 1.0
  val QwUniq = 1.5
  val QwMwl = 0.5
  val QwKeepBar = 0.5

  /** Linear quality-classifier scoring — the "model-scored quality
    * filter" stage of an LLM data pipeline (fasttext / logistic-
    * regression classifiers in the C4/CCNet/FineWeb lineage) with the
    * model reduced to its essence: a broadcast-sized weight vector
    * dotted against per-document features, a sigmoid, a threshold.
    * The features are this engine's deterministic quality signals
    * (length score, stopword ratio, distinct-token ratio, mean word
    * length), so the whole operator is reproducible end-to-end.
    *
    * Scale shape: pure map-side projection — the weights live in the
    * plan as literals (a real model's coefficient vector broadcasts
    * the same way), no shuffle beyond the presentation sort. Swapping
    * in trained weights changes constants, not the plan.
    */
  def curQualityWeights(s: SparkSession, d: String): DataFrame = {
    val stopList = TextAnalysis.stopEn.map(w => s"'$w'").mkString(", ")
    Tables.documents(s, d).select(col("doc_id"), col("text"), col("n_chars"))
      .orderBy(col("doc_id"))
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("nt", size(col("toks")).cast("double"))
      .withColumn("len_score", least(col("n_chars") / lit(500.0), lit(1.0)))
      .withColumn("stop_ratio",
        expr(s"size(filter(toks, t -> t IN ($stopList)))").cast("double") / col("nt"))
      .withColumn("uniq_ratio", size(array_distinct(col("toks"))) / col("nt"))
      .withColumn("mean_wl",
        (length(col("text")) - (col("nt") - 1)) / col("nt"))
      .withColumn("z",
        lit(QwBias) + lit(QwLen) * col("len_score")
          + lit(QwStop) * (lit(1.0) - col("stop_ratio"))
          + lit(QwUniq) * col("uniq_ratio")
          + lit(QwMwl) * col("mean_wl") / 10.0)
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6))
      // features rounded on output (oracle-parity rule: only
      // string/bigint/rounded-double leave an operator); the z that
      // feeds the score stays unrounded on BOTH engines.
      .select(col("doc_id"), round(col("len_score"), 6).as("len_score"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("uniq_ratio"), 6).as("uniq_ratio"),
        round(col("mean_wl"), 6).as("mean_wl"), col("score"),
        (col("score") >= QwKeepBar).cast("long").as("keep"))
  }

  /** FUZZY benchmark decontamination — flag training documents that
    * are NEAR-duplicates of any eval document (MinHash-banded
    * candidates, exact-Jaccard adjudication at
    * [[Dedup.JaccardThreshold]]), the generalization of the exact
    * n-gram-overlap decontamination family above: published pipelines
    * run both, because a paraphrased or lightly-perturbed benchmark
    * leaks through exact gram matching but not through near-dup
    * similarity. Eval set = doc_id % 20 == 0, as in
    * [[curDecontaminate]].
    *
    * Scale shape — the mirror image of
    * [[Dedup.dedupIncrementalMinhash]]: there BOTH band tables are
    * corpus-scale (sort-merge, broadcast nothing); here the eval side
    * is benchmark-sized (32 band rows per eval doc), so its band
    * index BROADCASTS and the corpus-side band stream never
    * shuffles for candidate generation. Only the candidate pairs
    * (eval-adjacent docs, a vanishing fraction) proceed to the
    * exact-verify joins. LSH recall at this corpus' similarity levels
    * is exact (DedupSimilaritySpec pins LSH pairs == exact pairs;
    * this query's pair set is that set restricted across the %20
    * split), so the row is held to the exact train×eval Jaccard
    * oracle with a keep-every-train-doc left join.
    */
  def curDecontaminateFuzzy(s: SparkSession, d: String): DataFrame = {
    val sh = Dedup.shingled(s, d).localCheckpoint()
    val bands = Dedup.bandTable(s, sh)
    val evalB = bands.filter(pmod(col("doc_id"), lit(20)) === 0)
    val trainB = bands.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val cand = trainB.as("a").join(broadcast(evalB).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val pairs = Dedup.verifyExactJaccard(cand, sh)
    Tables.documents(s, d).select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(20)) =!= 0)
      .join(pairs.groupBy(col("doc_a").as("doc_id"))
        .agg(count(lit(1)).as("hits"), max(col("jaccard")).as("mj")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hits"), lit(0L)).as("n_near_eval"),
        coalesce(col("mj"), lit(0.0)).as("max_jaccard"),
        (coalesce(col("hits"), lit(0L)) > 0).cast("long").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Per-source document cap for [[curSourceCap]]. */
  val SourceCap = 10

  /** Per-source document cap — the "domain cap" anti-spam curation
    * step (cap pages per domain so one prolific site cannot dominate
    * the mixture; the companion to [[curMixSources]]' rate-based
    * rebalancing): rank each source's documents by a deterministic
    * quality priority (longer documents first, doc_id tie-break) and
    * keep the top [[SourceCap]].
    *
    * Scale shape: a bounded-heap top-k aggregation
    * ([[graft.functions.TopKIds]], the same kernel as
    * q22/stream_topk) keyed by source, then a broadcast join-back of
    * the one-row-per-source keep lists. The heap combines map-side,
    * so a pathologically hot domain contributes O(cap) state per
    * input partition instead of funneling its entire row set through
    * one task's window sort — the `row_number().over(partitionBy
    * (source))` form this replaced was the engine's last
    * skewed-window straggler (AQE skew-split rescues shuffle joins,
    * not window sorts). The join-back side is `count(distinct
    * source) × cap` ids — domain-dictionary sized, always
    * broadcastable. Non-kept rows carry a NULL priority_rank: the
    * bounded heap legitimately discards ordering beyond the cap, and
    * a full per-source rank of every row is exactly the
    * sort-everything cost this operator exists to avoid.
    */
  def curSourceCap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val keep = docs.groupBy(col("source")).agg(
      graft.functions.TopKIds.topKIds(
        col("n_chars").cast("double"), col("doc_id"), SourceCap).as("keep_ids"))
    docs.join(broadcast(keep), Seq("source"))
      .withColumn("pos", array_position(col("keep_ids"), col("doc_id")))
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(col("pos") > 0, col("pos")).cast("long").as("priority_rank"),
        (col("pos") > 0).cast("long").as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Hash-feature buckets for [[curDsir]] (production DSIR uses ~10k;
    * 256 keeps the weight table readable while exercising identical
    * plumbing — the bucket table stays broadcast-sized either way).
    */
  val DsirBuckets = 256
  /** Additive smoothing for the bucket probabilities. */
  val DsirAlpha = 0.5
  /** Documents selected (top importance weights). */
  val DsirKeep = 100

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023): score every raw document by how much more likely
    * its hashed-n-gram features are under a TARGET distribution (a
    * small high-quality exemplar set — here the doc_id % 10 == 0
    * subset, standing in for "looks like Wikipedia") than under the
    * RAW-corpus distribution, then keep the top-weighted documents.
    * Features are word bigrams hashed into [[DsirBuckets]] buckets
    * (md5-derived so both engines compute the identical bucket);
    * log-weight = Σ_grams (ln p_target[bucket] − ln p_source[bucket])
    * with [[DsirAlpha]] additive smoothing. The paper resamples with
    * Gumbel noise; the deterministic engine form is top-[[DsirKeep]]
    * by (weight, doc_id) — swapping in noisy scores changes a column,
    * not the plan.
    *
    * Scale shape: feature hashing is pure map-side projection; the
    * only corpus-sized exchange is the (doc_id, bucket) count
    * aggregation (map-side partials, high-cardinality key). Both
    * distribution estimates collapse to [[DsirBuckets]]-row
    * aggregates that BROADCAST back as the weight table — exactly how
    * a trained importance model's parameters ship to executors — and
    * the final selection is the bounded-heap [[graft.functions.TopKIds]]
    * global top-k (O(k) state per partition, no global sort; same
    * kernel as [[curSourceCap]]).
    */
  def curDsir(s: SparkSession, d: String): DataFrame = {
    val b = DsirBuckets
    val alpha = DsirAlpha
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // barrier: the md5-per-gram feature hashing is CPU-bound and the
    // small-SF corpus is one parquet split — spread it across tasks
    val grams = barrier(s, docs)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) < 2 THEN cast(array() AS array<string>)
          |ELSE transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          |END""".stripMargin)).as("g"))
      .withColumn("m", md5(col("g")))
      .withColumn("bucket", expr(
        """(locate(substr(m, 1, 1), '0123456789abcdef') - 1) * 16
          | + (locate(substr(m, 2, 1), '0123456789abcdef') - 1)""".stripMargin))
      .select(col("doc_id"), col("bucket"))
    // ONE corpus pass: the (doc, bucket) counts are materialized once
    // and every distribution estimate derives from them — the source
    // and target bucket totals, and both grand totals, are sums of
    // integral doubles over this (docs × ≤256)-row table, so they are
    // bit-identical to counting the gram stream directly, and the
    // md5-per-gram feature hashing runs once instead of once per
    // consumer (the four grams consumers each re-ran the explode +
    // md5 scan; measured ~2.0 → ~0.8 s warm sf0.1).
    val cnts = grams.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("c"))
      .localCheckpoint(eager = false)
    // ONE [[DsirBuckets]]-row aggregation carries BOTH distribution
    // estimates (the target side as a conditional sum — a bucket with
    // no target grams gets 0.0, exactly the old left-join coalesce),
    // and the two grand totals ride the same 256-row frame as
    // unpartitioned window sums (the table is broadcast-destined, i.e.
    // single-node by definition). The r11 form paid three separate
    // aggregation jobs + a join + a crossJoin for the same numbers;
    // every value is an integral double < 2^53, so the regrouped
    // additions are bit-identical.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val weights = cnts.groupBy(col("bucket"))
      .agg(sum(col("c")).as("sc"),
        sum(when(pmod(col("doc_id"), lit(10)) === 0, col("c"))
          .otherwise(lit(0.0))).as("tc"))
      .withColumn("stot", sum(col("sc")).over(wAll))
      .withColumn("ttot", sum(col("tc")).over(wAll))
      .select(col("bucket"),
        (log((col("tc") + alpha) / (col("ttot") + alpha * b))
          - log((col("sc") + alpha) / (col("stot") + alpha * b))).as("lw"))
    val docw = cnts.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_grams"),
        round(sum(col("c") * col("lw")), 6).as("logw"))
    val scored = docs.select(col("doc_id")).join(docw, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
    val keep = scored.agg(graft.functions.TopKIds.topKIds(
      col("logw"), col("doc_id"), DsirKeep).as("keep_ids"))
    scored.crossJoin(broadcast(keep))
      .withColumn("pos", array_position(col("keep_ids"), col("doc_id")))
      .select(col("doc_id"), col("n_grams"), col("logw"),
        when(col("pos") > 0, col("pos")).cast("long").as("sel_rank"),
        (col("pos") > 0).cast("long").as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup cluster dedup with KEEP-BEST survivor selection — the
    * quality-aware refinement of [[Dedup.dedupClusters]]' keep-min-id
    * convention: within each connected component of the near-dup
    * graph, keep the highest-quality member (longest document,
    * doc_id tie-break) — what production dedup actually ships, since
    * the first-crawled copy of a page is often the truncated one.
    *
    * Scale shape: the component labels come from the pointer-doubling
    * propagation (O(log diameter) shuffle-join rounds); on top of
    * that, ONE hash aggregation keyed by cluster_rep computes each
    * cluster's argmax as `max(struct(quality, -doc_id))` — a plain
    * partial-aggregating max, no per-cluster sort — and one
    * key-equality join carries the survivor id back to members.
    * Nothing here assumes clusters fit anywhere: both exchanges key
    * on cluster_rep, and a giant cluster costs one combiner cell.
    */
  def curDedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val clusters = Dedup.dedupClusters(s, d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val j = clusters.join(docs, Seq("doc_id"))
    val best = j.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("n_chars").as("q"), (-col("doc_id")).as("negid"))).as("b"))
      .select(col("cluster_rep"), col("cluster_size"),
        (-col("b.negid")).as("keep_id"))
    j.join(best, Seq("cluster_rep"))
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"),
        col("keep_id"), (col("doc_id") === col("keep_id")).cast("long").as("kept"))
      .orderBy(col("doc_id"))
  }

  // CCNet bucket thresholds on the rounded cross-entropy. In
  // production these are the tercile cuts of a trained LM's
  // perplexity on a reference corpus (frozen constants shipped with
  // the pipeline); these values are this corpus' stable terciles —
  // measured 4.905/4.911 at every test SF.
  val CcnetHeadBar = 4.905
  val CcnetMiddleBar = 4.911

  /** CCNet perplexity bucketing (Wenzek et al. 2020): split the
    * corpus into head / middle / tail by LM cross-entropy — the
    * canonical "perplexity filter" that keeps fluent text and
    * discards noise, applied as fixed thresholds against
    * [[TextAnalysis.textLmScore]]'s xent signal. `keep` follows the
    * usual CCNet policy of dropping only the tail.
    *
    * Scale shape: xent is the lm_score pipeline (broadcast frequency
    * table, per-doc aggregation); bucketing is a pure map-side CASE
    * against plan-literal thresholds, and the per-bucket census
    * joins back as a broadcast 3-row table. Swapping in a real LM's
    * scores changes the xent column's producer, nothing downstream.
    */
  def curCcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val scored = TextAnalysis.textLmScore(s, d)
      .select(col("doc_id"), col("n_toks"), col("xent"))
      .withColumn("bucket",
        when(col("xent") < CcnetHeadBar, "head")
          .when(col("xent") < CcnetMiddleBar, "middle")
          .otherwise("tail"))
    val census = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bucket_docs"), sum(col("n_toks")).as("bucket_tokens"))
    scored.join(broadcast(census), Seq("bucket"))
      .select(col("doc_id"), col("xent"), col("bucket"),
        col("bucket_docs"), col("bucket_tokens"),
        (col("bucket") =!= "tail").cast("long").as("keep"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Temperature-scaled source mixing + weighted sampling.
  // ------------------------------------------------------------------

  /** Temperature-scaled source sampling (the multilingual/data-mixture
    * α-temperature rule): sources keep documents at rate
    * (T_min / T_src)^(1−α) with α = 0.5, flattening the source
    * distribution toward uniform without fully equalizing it
    * (contrast [[curMixSources]], which hard-floors every source to
    * the smallest token budget). Engine-portable determinism: the rate
    * is sqrt of a ratio of exact token totals — one correctly-rounded
    * double sqrt — scaled by 2^16 (exact) and floored into an integer
    * bar compared against a 16-bit md5 slice of the doc id. The rate
    * table is |sources| rows (broadcast); the corpus itself never
    * shuffles — the sample is a map-side filter, as at 100 TB.
    */
  def curTemperatureMix(s: SparkSession, d: String): DataFrame =
    temperatureKept(s, d).orderBy(col("doc_id"))

  /** The temperature-mixed kept set without the presentation sort —
    * shared by [[curTemperatureMix]] and the [[curTemperaturePack]]
    * funnel (whose group exchange would discard the order anyway).
    */
  private[graft] def temperatureKept(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val rates = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("min_tokens",
        min(col("src_tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("source"),
        floor(sqrt(col("min_tokens").cast("double") / col("src_tokens").cast("double"))
          * 65536.0).cast("long").as("keep_bar"))
    docs.join(broadcast(rates), "source")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") < col("keep_bar"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("keep_bar"))
  }

  /** Whole-document best-fit-decreasing packing of the
    * temperature-mixed corpus — the [[curTemperatureMix]] →
    * pack funnel composed as ONE query (the [[curPipeline]]
    * discipline), and the packing form training pipelines
    * increasingly run instead of concat-and-split ([[curPack]]):
    * documents stay INTACT (no example crosses a sequence boundary),
    * so bins are padded, and best-fit-decreasing recovers most of the
    * padding loss (BFD ≤ 11/9·OPT + 6/9 bins, Johnson 1973).
    *
    * Within each (source, shard) group the kept documents sort by
    * (n_tokens desc, doc_id) and each goes to the FULLEST bin that
    * still fits (ties → smallest bin id; no fit → a new bin; a
    * longer-than-window document gets its own oversize bin). The fold
    * is inherently sequential, so it runs as a typed per-group kernel
    * — bounded because a pack shard is SIZED to a task by
    * construction ([[NumPackShards]] scales with the cluster at
    * 100 TB, exactly like [[curPack]]'s layout), never by the data.
    * The temperature filter upstream is the map-side rate-table
    * filter — the corpus reaches the group exchange already mixed,
    * and that one exchange is the query's only corpus-sized shuffle.
    * Output carries each document's bin and the bin's FINAL fill;
    * the DuckDB oracle replays the whole funnel — rate table, filter,
    * BFD fold (a recursive CTE stepping rank-by-rank per group,
    * carrying the bin-load list) — so placement, bin ids and fills
    * are all hash-gated.
    */
  def curTemperaturePack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val shardCol = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("long"),
      lit(NumPackShards.toLong))
    temperatureKept(s, d)
      .select(col("source"), shardCol.as("shard"), col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long, Long)]
      .groupByKey { case (src, sh, _, _) => (src, sh) }
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (src, sh) = key
        val docs = it.map { case (_, _, id, n) => (id, n) }.toArray
          .sortBy { case (id, n) => (-n, id) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        val placed = docs.map { case (id, n) =>
          var best = -1
          var bestLoad = -1L
          var b = 0
          while (b < loads.length) {
            if (loads(b) + n <= PackWindow && loads(b) > bestLoad) {
              bestLoad = loads(b); best = b
            }
            b += 1
          }
          if (best < 0) { loads += n; (id, n, loads.length - 1) }
          else { loads(best) += n; (id, n, best) }
        }
        placed.iterator.map { case (id, n, b) =>
          (id, src, sh, n, b.toLong, loads(b))
        }
      }
      .toDF("doc_id", "source", "shard", "n_tokens", "bin_id", "bin_fill")
      .orderBy(col("doc_id"))
  }

  /** Distributed weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each document draws
    * u = (h+1)/2^48 from its 48-bit md5 slice and competes on the key
    * ln(u)/weight (equivalent to u^(1/w)); the global top-100 keys win.
    * The selection is ONE bounded-heap aggregation
    * ([[graft.functions.TopKIds]]) with map-side partial merge — the
    * standard one-pass distributed reservoir for weighted sampling,
    * no global sort at any scale. Every per-row key is pure
    * correctly-rounded double arithmetic on exact integers (the only
    * libm call, ln, can differ by an ulp across engines — far below
    * the ~1/n spacing of adjacent order statistics, so the selected
    * set is deterministic). Weights join back over a broadcast of the
    * 100 winners, never the corpus.
    */
  def curWeightedSample(s: SparkSession, d: String): DataFrame = {
    val Dom = 281474976710656.0 // 2^48, a power of two: division is exact
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        (log((conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("double") + 1.0) / Dom) / col("n_chars").cast("double")).as("k"))
    val top = keyed
      .agg(graft.functions.TopKIds.topKIds(col("k"), col("doc_id"), 100).as("ids"))
      .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select((col("pos") + 1).cast("long").as("rank"), col("doc_id"))
    Tables.documents(s, d)
      .join(broadcast(top), "doc_id")
      .select(col("rank"), col("doc_id"), col("n_chars").cast("long").as("weight"))
      .orderBy(col("rank"))
  }

  /** Laplace-mechanism count release — SIMULATION, not a privacy
    * guarantee: per-source document counts published with inverse-CDF
    * Laplace noise at the ε=1 scale, exercising exactly the transform
    * a DP aggregate release runs. The noise draw is DETERMINISTIC
    * (inverse CDF on a 48-bit md5 uniform per source, the engine's
    * seeded-randomness convention) so the release is reproducible and
    * hash-gated — and therefore provides NO differential privacy:
    * anyone can recompute md5(source) from the released row and
    * subtract the noise. The output labels the scale `sim_epsilon` to
    * make the synthetic nature explicit; a production deployment
    * swaps the md5 uniform for a draw seeded by a secret key (or a
    * true RNG plus an ε budget ledger) without touching the plan
    * shape. ln on a well-separated uniform keeps the 3-decimal
    * rounding away from any cross-engine ulp boundary. One bounded
    * dimension aggregate plus a map — nothing corpus-sized moves.
    */
  def curDpCount(s: SparkSession, d: String): DataFrame = {
    val Dom = 281474976710656.0 // 2^48
    Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("u",
        (conv(substring(md5(col("source")), 1, 12), 16, 10).cast("double") + 0.5) / Dom)
      .withColumn("noise",
        when(col("u") < 0.5, log(col("u") * 2.0))
          .otherwise(-log((lit(1.0) - col("u")) * 2.0)))
      .select(col("source"), lit(1.0).as("sim_epsilon"),
        round(col("n") + col("noise"), 3).as("noised_count"))
      .orderBy(col("source"))
  }

  /** k-anonymity suppression (k=5) over the quasi-identifier tuple
    * (lang, source, length bucket): documents whose QI group holds
    * fewer than k members are released with their quasi-identifiers
    * SUPPRESSED (nulled), so no released row is attributable to fewer
    * than k candidates — the record-level privacy complement of
    * [[curDpCount]]'s aggregate release. Group sizes are one hash
    * aggregation on the bounded QI dimension broadcast back onto the
    * corpus; the length bucket is integer arithmetic (no float
    * boundary). NULL quasi-identifiers are coalesced to sentinel
    * values BEFORE grouping: nulls never equi-join, so without the
    * sentinel a null-QI record would vanish from the release
    * entirely instead of flowing through the k-threshold
    * suppression path — every input row must come out either
    * released or suppressed.
    */
  def curKAnon(s: SparkSession, d: String): DataFrame = {
    val K = 5
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        coalesce(col("lang"), lit("__null__")).as("lang"),
        coalesce(col("source"), lit("__null__")).as("source"),
        coalesce(expr("n_chars DIV 100"), lit(-1L)).as("len_bucket"))
    val groups = docs.groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("group_n"))
    docs.join(broadcast(groups), Seq("lang", "source", "len_bucket"))
      .select(col("doc_id"),
        when(col("group_n") >= K, col("lang")).otherwise(lit(null).cast("string"))
          .as("lang"),
        when(col("group_n") >= K, col("source")).otherwise(lit(null).cast("string"))
          .as("source"),
        when(col("group_n") >= K, col("len_bucket")).otherwise(lit(null).cast("long"))
          .as("len_bucket"),
        col("group_n"),
        (col("group_n") >= K).cast("long").as("released"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cur_k_anon" -> curKAnon _,
    "cur_dp_count" -> curDpCount _,
    "cur_eval_overlap" -> curEvalOverlap _,
    "cur_novelty" -> curNovelty _,
    "cur_temperature_mix" -> curTemperatureMix _,
    "cur_temperature_pack" -> curTemperaturePack _,
    "cur_weighted_sample" -> curWeightedSample _,
    "cur_ccnet_buckets" -> curCcnetBuckets _,
    "cur_dedup_keep_best" -> curDedupKeepBest _,
    "cur_dsir" -> curDsir _,
    "cur_source_cap" -> curSourceCap _,
    "cur_decontaminate_fuzzy" -> curDecontaminateFuzzy _,
    "cur_quality_weights" -> curQualityWeights _,
    "cur_gopher_rules" -> curGopherRules _,
    "cur_keep_list" -> curKeepList _,
    "cur_pii_redact" -> curPiiRedact _,
    "cur_decontaminate" -> curDecontaminate _,
    "cur_decontaminate_shuffle" -> curDecontaminateShuffle _,
    "cur_decontaminate_bloom" -> curDecontaminateBloom _,
    "cur_repetition" -> curRepetition _,
    "cur_chunk" -> curChunk _,
    "cur_sample_stratified" -> curSampleStratified _,
    "cur_split" -> curSplit _,
    "cur_pipeline" -> curPipeline _,
    "cur_shard_shuffle" -> curShardShuffle _,
    "cur_quality_lr_fit" -> curQualityLrFit _,
    "cur_mix_sources" -> curMixSources _,
    "cur_dup_ngram_frac" -> curDupNgramFrac _,
    "cur_tfidf_topterms" -> curTfidfTopterms _,
    "cur_pack" -> curPack _)

  private val decontaminateOracle =
    """WITH t AS (SELECT doc_id, list_distinct(list_transform(
      |   generate_series(1, len(string_split(text, ' ')) - 4),
      |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
      |        string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
      |        string_split(text, ' ')[i+4])) AS g5 FROM documents),
      |ev AS (SELECT DISTINCT unnest(g5) AS g FROM t WHERE doc_id % 20 = 0),
      |tr AS (SELECT doc_id, unnest(g5) AS g FROM t WHERE doc_id % 20 <> 0)
      |SELECT tr.doc_id,
      | CAST(count(ev.g) AS BIGINT) AS n_overlap,
      | CAST(CASE WHEN count(ev.g) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      |FROM tr LEFT JOIN ev ON tr.g = ev.g
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "cur_k_anon" ->
      """WITH d AS (SELECT doc_id, COALESCE(lang, '__null__') AS lang,
        |           COALESCE(source, '__null__') AS source,
        |           COALESCE(n_chars // 100, -1) AS len_bucket
        |           FROM documents),
        |g AS (SELECT lang, source, len_bucket, CAST(count(*) AS BIGINT) AS group_n
        |      FROM d GROUP BY 1, 2, 3)
        |SELECT doc_id,
        | CASE WHEN group_n >= 5 THEN d.lang END AS lang,
        | CASE WHEN group_n >= 5 THEN d.source END AS source,
        | CASE WHEN group_n >= 5 THEN d.len_bucket END AS len_bucket,
        | group_n, CAST(CASE WHEN group_n >= 5 THEN 1 ELSE 0 END AS BIGINT)
        |   AS released
        |FROM d JOIN g ON d.lang = g.lang AND d.source = g.source
        |  AND d.len_bucket = g.len_bucket
        |ORDER BY doc_id""".stripMargin,
    "cur_dp_count" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
        |           GROUP BY source),
        |u AS (SELECT source, n,
        |   (CAST('0x' || substring(md5(source), 1, 12) AS BIGINT) + 0.5)
        |     / 281474976710656.0 AS u
        |  FROM c)
        |SELECT source, 1.0 AS sim_epsilon,
        | round(n + CASE WHEN u < 0.5 THEN ln(u * 2.0)
        |                ELSE -ln((1.0 - u) * 2.0) END, 3) AS noised_count
        |FROM u ORDER BY source""".stripMargin,
    "cur_eval_overlap" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text, ' ')) - 4),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
        |        string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
        |        string_split(text, ' ')[i+4])) AS g5 FROM documents),
        |ev AS (SELECT doc_id, unnest(g5) AS g FROM t WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id, unnest(g5) AS g FROM t WHERE doc_id % 20 <> 0)
        |SELECT ev.doc_id,
        | CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs,
        | CAST(CASE WHEN count(tr.doc_id) > 0 THEN 1 ELSE 0 END AS BIGINT)
        |   AS compromised
        |FROM ev LEFT JOIN tr ON ev.g = tr.g
        |GROUP BY ev.doc_id ORDER BY ev.doc_id""".stripMargin,
    "cur_novelty" ->
      s"""WITH t AS (SELECT doc_id, list_distinct(list_transform(
         |   generate_series(1, len(string_split(text, ' ')) - 4),
         |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
         |        string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
         |        string_split(text, ' ')[i+4])) AS g5 FROM documents),
         |ev AS (SELECT doc_id, unnest(g5) AS g FROM t WHERE doc_id % 20 = 0),
         |trg AS (SELECT DISTINCT g FROM
         |  (SELECT unnest(g5) AS g FROM t WHERE doc_id % 20 <> 0)),
         |j AS (SELECT ev.doc_id, count(*) AS n_grams, count(trg.g) AS n_hit
         |      FROM ev LEFT JOIN trg ON ev.g = trg.g GROUP BY ev.doc_id)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         | CAST(n_hit AS BIGINT) AS n_hit,
         | round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS hit_frac,
         | round(1.0 - CAST(n_hit AS DOUBLE) / n_grams, 6) AS novelty,
         | CAST(CASE WHEN round(CAST(n_hit AS DOUBLE) / n_grams, 6)
         |   >= $NoveltyMemorizedBar THEN 1 ELSE 0 END AS BIGINT) AS memorized
         |FROM j ORDER BY doc_id""".stripMargin,
    "cur_temperature_mix" ->
      """WITH docs AS (SELECT doc_id, source,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        |        FROM docs GROUP BY source),
        |rates AS (SELECT source,
        |   CAST(floor(sqrt(CAST((SELECT min(src_tokens) FROM per) AS DOUBLE) /
        |     CAST(src_tokens AS DOUBLE)) * 65536.0) AS BIGINT) AS keep_bar FROM per)
        |SELECT doc_id, docs.source, n_tokens, keep_bar
        |FROM docs JOIN rates ON docs.source = rates.source
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
        |      < keep_bar
        |ORDER BY doc_id""".stripMargin,
    // full replay of the temperature->BFD funnel: rate table + filter
    // (the cur_temperature_mix oracle), then the best-fit-decreasing
    // fold as a recursive CTE stepping rank-by-rank per (source,
    // shard) group, carrying the bin-load list — placement = first
    // position of the max load that still fits (ties to the smaller
    // bin id, new bin when none fits), byte-matching the engine fold.
    "cur_temperature_pack" ->
      s"""WITH RECURSIVE
         |docs0 AS (SELECT doc_id, source,
         |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
         |        FROM docs0 GROUP BY source),
         |rates AS (SELECT source,
         |   CAST(floor(sqrt(CAST((SELECT min(src_tokens) FROM per) AS DOUBLE) /
         |     CAST(src_tokens AS DOUBLE)) * 65536.0) AS BIGINT) AS keep_bar FROM per),
         |kept AS (SELECT doc_id, docs0.source, n_tokens,
         |   CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
         |     % $NumPackShards AS shard
         |  FROM docs0 JOIN rates ON docs0.source = rates.source
         |  WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
         |        < keep_bar),
         |ordd AS (SELECT *, CAST(row_number() OVER (PARTITION BY source, shard
         |    ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rk FROM kept),
         |st AS (
         |  SELECT source, shard, CAST(0 AS BIGINT) AS rk,
         |    CAST([] AS BIGINT[]) AS loads, CAST(NULL AS BIGINT) AS doc_id,
         |    CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS bin_id
         |  FROM (SELECT DISTINCT source, shard FROM ordd)
         |  UNION ALL
         |  SELECT d.source, d.shard, d.rk,
         |    CASE WHEN list_position(st.loads, list_max(list_filter(st.loads,
         |           x -> x + d.n_tokens <= $PackWindow))) IS NULL
         |         THEN list_append(st.loads, d.n_tokens)
         |         ELSE list_transform(st.loads, (x, i) ->
         |           CASE WHEN i = list_position(st.loads, list_max(list_filter(st.loads,
         |                  y -> y + d.n_tokens <= $PackWindow)))
         |                THEN x + d.n_tokens ELSE x END) END,
         |    d.doc_id, d.n_tokens,
         |    CASE WHEN list_position(st.loads, list_max(list_filter(st.loads,
         |           x -> x + d.n_tokens <= $PackWindow))) IS NULL
         |         THEN CAST(len(st.loads) AS BIGINT)
         |         ELSE CAST(list_position(st.loads, list_max(list_filter(st.loads,
         |           x -> x + d.n_tokens <= $PackWindow))) - 1 AS BIGINT) END
         |  FROM st JOIN ordd d
         |    ON d.source = st.source AND d.shard = st.shard AND d.rk = st.rk + 1),
         |placed AS (SELECT source, shard, doc_id, n_tokens, bin_id
         |           FROM st WHERE rk >= 1),
         |fills AS (SELECT source, shard, bin_id,
         |   CAST(sum(n_tokens) AS BIGINT) AS bin_fill
         |  FROM placed GROUP BY 1, 2, 3)
         |SELECT placed.doc_id, placed.source, CAST(placed.shard AS BIGINT) AS shard,
         | placed.n_tokens, CAST(placed.bin_id AS BIGINT) AS bin_id, fills.bin_fill
         |FROM placed JOIN fills USING (source, shard, bin_id)
         |ORDER BY placed.doc_id""".stripMargin,
    "cur_weighted_sample" ->
      """WITH w AS (SELECT doc_id, n_chars,
        |   ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
        |       + 1.0) / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents),
        |t AS (SELECT doc_id, n_chars,
        |   row_number() OVER (ORDER BY k DESC, doc_id) AS rank FROM w)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
        | CAST(n_chars AS BIGINT) AS weight
        |FROM t WHERE rank <= 100 ORDER BY rank""".stripMargin,
    "cur_ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
         |x AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |   round(log2(max(n)) - avg(log2(c)), 6) AS xent
         |  FROM toks JOIN freq USING (tok), tot GROUP BY doc_id),
         |b AS (SELECT doc_id, n_toks, xent,
         |   CASE WHEN xent < $CcnetHeadBar THEN 'head'
         |        WHEN xent < $CcnetMiddleBar THEN 'middle'
         |        ELSE 'tail' END AS bucket FROM x),
         |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS bucket_docs,
         |   CAST(sum(n_toks) AS BIGINT) AS bucket_tokens FROM b GROUP BY 1)
         |SELECT doc_id, xent, b.bucket, bucket_docs, bucket_tokens,
         | CAST(CASE WHEN b.bucket <> 'tail' THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM b JOIN c USING (bucket) ORDER BY doc_id""".stripMargin,
    // clusterLabelCte concatenated, not inside stripMargin (its `||`
    // operators start lines — see the dedup_clusters oracle note).
    "cur_dedup_keep_best" -> (Dedup.clusterLabelCte + ",\n" +
      """lab AS (SELECT d.doc_id, coalesce(rep.cluster_rep, d.doc_id) AS cluster_rep,
        |   d.n_chars FROM documents d LEFT JOIN rep ON rep.doc_id = d.doc_id),
        |best AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size,
        |   (list(doc_id ORDER BY n_chars DESC, doc_id))[1] AS keep_id
        |  FROM lab GROUP BY 1)
        |SELECT lab.doc_id, lab.cluster_rep, cluster_size, keep_id,
        | CAST(CASE WHEN lab.doc_id = keep_id THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM lab JOIN best USING (cluster_rep)
        |ORDER BY lab.doc_id""".stripMargin),
    "cur_dsir" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
         |   ELSE list_transform(generate_series(1, len(toks) - 1),
         |     i -> toks[i] || ' ' || toks[i + 1]) END) AS g FROM t),
         |b AS (SELECT doc_id,
         |   (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
         |   + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) AS bucket FROM g),
         |cnts AS (SELECT doc_id, bucket, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY 1, 2),
         |src AS (SELECT bucket, CAST(count(*) AS DOUBLE) AS sc FROM b GROUP BY 1),
         |tgt AS (SELECT bucket, CAST(count(*) AS DOUBLE) AS tc FROM b
         |   WHERE doc_id % 10 = 0 GROUP BY 1),
         |tot AS (SELECT CAST((SELECT count(*) FROM b) AS DOUBLE) AS stot,
         |   CAST((SELECT count(*) FROM b WHERE doc_id % 10 = 0) AS DOUBLE) AS ttot),
         |w AS (SELECT bucket,
         |   ln((coalesce(tc, 0) + $DsirAlpha) / (ttot + $DsirAlpha * $DsirBuckets))
         |   - ln((sc + $DsirAlpha) / (stot + $DsirAlpha * $DsirBuckets)) AS lw
         |  FROM src LEFT JOIN tgt USING (bucket), tot),
         |docw AS (SELECT cnts.doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |   round(sum(c * lw), 6) AS logw FROM cnts JOIN w USING (bucket) GROUP BY 1),
         |scored AS (SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         |   coalesce(logw, 0.0) AS logw FROM documents d LEFT JOIN docw USING (doc_id)),
         |r AS (SELECT doc_id, n_grams, logw,
         |   row_number() OVER (ORDER BY logw DESC, doc_id) AS rn FROM scored)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, logw,
         | CAST(CASE WHEN rn <= $DsirKeep THEN rn END AS BIGINT) AS sel_rank,
         | CAST(CASE WHEN rn <= $DsirKeep THEN 1 ELSE 0 END AS BIGINT) AS selected
         |FROM r ORDER BY doc_id""".stripMargin,
    "cur_source_cap" ->
      s"""SELECT doc_id, source, n_chars,
         | CAST(CASE WHEN rn <= $SourceCap THEN rn END AS BIGINT) AS priority_rank,
         | CAST(CASE WHEN rn <= $SourceCap THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM (SELECT doc_id, source, n_chars, row_number() OVER (PARTITION BY source
         |   ORDER BY n_chars DESC, doc_id) AS rn FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "cur_decontaminate_fuzzy" ->
      raw"""WITH t AS (SELECT doc_id, list_distinct(list_transform(
           |   generate_series(1, len(string_split(text, ' ')) - 2),
           |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
           |        || ' ' || string_split(text, ' ')[i+2])) AS sh FROM documents),
           |sz AS (SELECT doc_id, len(sh) AS n FROM t),
           |e AS (SELECT doc_id, unnest(sh) AS s FROM t),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
           |      FROM e a JOIN e b ON a.s = b.s
           |       AND a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0 GROUP BY 1, 2),
           |j AS (SELECT doc_a,
           |   round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) AS jaccard
           |  FROM p JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
           |  WHERE round(CAST(inter AS DOUBLE) / (x.n + y.n - inter), 4) >= ${Dedup.JaccardThreshold}),
           |agg AS (SELECT doc_a AS doc_id, CAST(count(*) AS BIGINT) AS hits,
           |   max(jaccard) AS mj FROM j GROUP BY 1)
           |SELECT d.doc_id,
           | CAST(coalesce(hits, 0) AS BIGINT) AS n_near_eval,
           | coalesce(mj, 0.0) AS max_jaccard,
           | CAST(CASE WHEN coalesce(hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
           |LEFT JOIN agg USING (doc_id)
           |ORDER BY doc_id""".stripMargin,
    "cur_quality_weights" -> {
      val stopList = TextAnalysis.stopEn.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, n_chars,
         |  string_split(text, ' ') AS toks,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt FROM documents),
         |f AS (SELECT doc_id,
         |  least(n_chars / 500.0, 1.0) AS len_score,
         |  CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE) / nt AS stop_ratio,
         |  len(list_distinct(toks)) / nt AS uniq_ratio,
         |  (length(text) - (nt - 1)) / nt AS mean_wl
         | FROM t),
         |z AS (SELECT *, $QwBias + $QwLen * len_score + $QwStop * (1.0 - stop_ratio)
         |    + $QwUniq * uniq_ratio + $QwMwl * mean_wl / 10.0 AS zz FROM f)
         |SELECT doc_id, round(len_score, 6) AS len_score,
         | round(stop_ratio, 6) AS stop_ratio,
         | round(uniq_ratio, 6) AS uniq_ratio,
         | round(mean_wl, 6) AS mean_wl,
         | round(1.0 / (1.0 + exp(-zz)), 6) AS score,
         | CAST(CASE WHEN round(1.0 / (1.0 + exp(-zz)), 6) >= $QwKeepBar
         |   THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM z ORDER BY doc_id""".stripMargin
    },
    "cur_gopher_rules" -> {
      val inList = gopherStops.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
         |  length(text) AS nc FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(nc - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_wl,
         |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
         |    / len(toks) AS alpha_frac,
         |  CAST(len(list_filter(toks, x -> x IN ($inList))) AS BIGINT) AS stop_hits,
         |  CAST(nc - length(replace(text, '#', '')) AS DOUBLE) / len(toks) AS symbol_frac
         | FROM t)
         |SELECT doc_id, n_words, mean_wl, alpha_frac, stop_hits, symbol_frac,
         | CAST(CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords
         |   THEN 1 ELSE 0 END AS BIGINT) AS wc_ok,
         | CAST(CASE WHEN mean_wl BETWEEN $GopherMinWordLen AND $GopherMaxWordLen
         |   THEN 1 ELSE 0 END AS BIGINT) AS mwl_ok,
         | CAST(CASE WHEN stop_hits >= $GopherMinStopHits THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
         | CAST(CASE WHEN alpha_frac >= $GopherMinAlphaFrac THEN 1 ELSE 0 END AS BIGINT) AS alpha_ok,
         | CAST(CASE WHEN symbol_frac <= $GopherMaxSymbolFrac THEN 1 ELSE 0 END AS BIGINT) AS symbol_ok,
         | CAST(CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords
         |        AND mean_wl BETWEEN $GopherMinWordLen AND $GopherMaxWordLen
         |        AND stop_hits >= $GopherMinStopHits
         |        AND alpha_frac >= $GopherMinAlphaFrac
         |        AND symbol_frac <= $GopherMaxSymbolFrac
         |   THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "cur_keep_list" ->
      """WITH ck AS (
        | SELECT doc_id, row_number() OVER (
        |   PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |   ORDER BY doc_id) AS rn
        | FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        | SELECT doc_id, unnest(toks) AS g, 1 AS k FROM t
        | UNION ALL
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1])), 2 FROM t
        | UNION ALL
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])), 3 FROM t),
        |c AS (SELECT doc_id, g, k, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |m AS (SELECT doc_id,
        |  max(CASE WHEN k = 1 THEN c END) AS top1,
        |  sum(CASE WHEN k = 1 THEN c END) AS n1,
        |  max(CASE WHEN k = 2 THEN c END) AS top2,
        |  sum(CASE WHEN k = 2 THEN c END) AS n2,
        |  sum(CASE WHEN k = 3 THEN c END) AS n3,
        |  count(CASE WHEN k = 3 THEN 1 END) AS d3
        | FROM c GROUP BY doc_id),
        |rep AS (SELECT doc_id,
        |  CASE WHEN CAST(top1 AS DOUBLE) / n1 <= 0.11
        |    AND CAST(top2 AS DOUBLE) / n2 <= 0.05
        |    AND CAST(n3 - d3 AS DOUBLE) / n3 <= 0.1 THEN 1 ELSE 0 END AS rep_keep
        | FROM m),
        |t5 AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text, ' ')) - 4),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
        |        string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
        |        string_split(text, ' ')[i+4])) AS g5 FROM documents),
        |ev AS (SELECT DISTINCT unnest(g5) AS g FROM t5 WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id, unnest(g5) AS g FROM t5 WHERE doc_id % 20 <> 0),
        |dec AS (SELECT tr.doc_id,
        |  CASE WHEN count(ev.g) > 0 THEN 1 ELSE 0 END AS contaminated
        | FROM tr LEFT JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id),
        |verdict AS (SELECT d.doc_id,
        |  CASE WHEN d.doc_id % 20 = 0 THEN 'eval_holdout'
        |       WHEN ck.rn <> 1 THEN 'exact_dup'
        |       WHEN dec.contaminated = 1 THEN 'contaminated'
        |       WHEN rep.rep_keep = 0 THEN 'repetitive'
        |       ELSE 'ok' END AS reason
        | FROM documents d
        | JOIN ck USING (doc_id)
        | LEFT JOIN rep USING (doc_id)
        | LEFT JOIN dec USING (doc_id))
        |SELECT doc_id, reason,
        | CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM verdict ORDER BY doc_id""".stripMargin,
    "cur_pii_redact" ->
      raw"""WITH r AS (SELECT doc_id,
           | 'contact user' || doc_id || '@example.com' ||
           | CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
           | CASE WHEN doc_id % 2 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
           | ' via https://ex.com/d/' || doc_id || ' :: ' || text AS raw
           |FROM documents)
           |SELECT doc_id,
           | regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
           |   'https?://[^ ]+', '[URL]', 'g'),
           |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           |   '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
           |   '\+1-555-\d{4}', '[PHONE]', 'g') AS redacted,
           | CAST(len(regexp_extract_all(raw, 'https?://[^ ]+'))
           |  + len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           |  + len(regexp_extract_all(raw, '\b\d{3}-\d{2}-\d{4}\b'))
           |  + len(regexp_extract_all(raw, '\+1-555-\d{4}')) AS BIGINT) AS n_pii
           |FROM r ORDER BY doc_id""".stripMargin,
    "cur_decontaminate" -> decontaminateOracle,
    // identical semantics, different join strategy — same oracle
    "cur_decontaminate_shuffle" -> decontaminateOracle,
    // FP-free at the configured bits/items ratio — same exact oracle
    "cur_decontaminate_bloom" -> decontaminateOracle,
    "cur_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        | SELECT doc_id, unnest(toks) AS g, 1 AS k FROM t
        | UNION ALL
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1])), 2 FROM t
        | UNION ALL
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])), 3 FROM t),
        |c AS (SELECT doc_id, g, k, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |m AS (SELECT doc_id,
        |  max(CASE WHEN k = 1 THEN c END) AS top1,
        |  sum(CASE WHEN k = 1 THEN c END) AS n1,
        |  max(CASE WHEN k = 2 THEN c END) AS top2,
        |  sum(CASE WHEN k = 2 THEN c END) AS n2,
        |  sum(CASE WHEN k = 3 THEN c END) AS n3,
        |  count(CASE WHEN k = 3 THEN 1 END) AS d3
        | FROM c GROUP BY doc_id)
        |SELECT doc_id,
        | CAST(top1 AS DOUBLE) / n1 AS max_tok_frac,
        | CAST(top2 AS DOUBLE) / n2 AS top_2gram_frac,
        | CAST(n3 - d3 AS DOUBLE) / n3 AS dup_3gram_frac,
        | CAST(CASE WHEN CAST(top1 AS DOUBLE) / n1 <= 0.11
        |   AND CAST(top2 AS DOUBLE) / n2 <= 0.05
        |   AND CAST(n3 - d3 AS DOUBLE) / n3 <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "cur_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |n AS (SELECT doc_id, toks,
         |  CASE WHEN len(toks) <= $ChunkSize THEN 1
         |       ELSE CAST(ceil((len(toks) - $ChunkSize) / $ChunkStride.0) AS BIGINT) + 1
         |  END AS nc FROM t),
         |c AS (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS chunk_id FROM n)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         | array_to_string(list_slice(toks, chunk_id * $ChunkStride + 1,
         |   chunk_id * $ChunkStride + $ChunkSize), ' ') AS chunk_text,
         | CAST(len(list_slice(toks, chunk_id * $ChunkStride + 1,
         |   chunk_id * $ChunkStride + $ChunkSize)) AS BIGINT) AS n_chunk_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "cur_sample_stratified" ->
      """SELECT doc_id, lang, source,
        | substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_key
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |  CASE WHEN lang = 'en' THEN '33' ELSE '7f' END
        |ORDER BY doc_id""".stripMargin,
    "cur_pipeline" -> {
      val stopIn = gopherStops.map(w => s"'$w'").mkString(", ")
      val enIn = TextAnalysis.stopEn.map(w => s"'$w'").mkString(", ")
      val sqlIn = TextAnalysis.stopSql.map(w => s"'$w'").mkString(", ")
      val dataIn = TextAnalysis.stopData.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
         |  length(text) AS nc FROM documents),
         |m AS (SELECT doc_id, text,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(nc - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_wl,
         |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
         |    / len(toks) AS alpha_frac,
         |  CAST(len(list_filter(toks, x -> x IN ($stopIn))) AS BIGINT) AS stop_hits,
         |  CAST(nc - length(replace(text, '#', '')) AS DOUBLE) / len(toks) AS symbol_frac,
         |  len(list_filter(toks, x -> x IN ($enIn))) AS c_en,
         |  len(list_filter(toks, x -> x IN ($sqlIn))) AS c_sql,
         |  len(list_filter(toks, x -> x IN ($dataIn))) AS c_data
         | FROM t),
         |f AS (SELECT doc_id,
         |  (doc_id % 20 = 0) AS holdout,
         |  (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
         |   AND mean_wl BETWEEN $GopherMinWordLen AND $GopherMaxWordLen
         |   AND stop_hits >= $GopherMinStopHits
         |   AND alpha_frac >= $GopherMinAlphaFrac
         |   AND symbol_frac <= $GopherMaxSymbolFrac) AS gopher_keep,
         |  (c_en >= c_sql AND c_en >= c_data) AS lang_en,
         |  md5(text) AS th
         | FROM m),
         |g AS (SELECT doc_id, list_distinct(list_transform(
         |   generate_series(1, len(string_split(text, ' ')) - 4),
         |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
         |        string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
         |        string_split(text, ' ')[i+4])) AS g5 FROM documents),
         |firsts AS (SELECT th, min(doc_id) AS first_id FROM f
         | WHERE NOT holdout AND gopher_keep AND lang_en GROUP BY th),
         |ev AS (SELECT DISTINCT unnest(g5) AS g FROM g WHERE doc_id % 20 = 0),
         |tr AS (SELECT f.doc_id, unnest(g.g5) AS gg
         | FROM f JOIN firsts ON f.th = firsts.th AND f.doc_id = firsts.first_id
         |        JOIN g ON g.doc_id = f.doc_id
         | WHERE NOT f.holdout AND f.gopher_keep AND f.lang_en),
         |contam AS (SELECT tr.doc_id, count(ev.g) AS n_overlap
         | FROM tr LEFT JOIN ev ON tr.gg = ev.g GROUP BY tr.doc_id),
         |sel AS (SELECT f.doc_id,
         |  CASE WHEN f.holdout THEN 'eval_holdout'
         |       WHEN NOT f.gopher_keep THEN 'gopher'
         |       WHEN NOT f.lang_en THEN 'langid'
         |       WHEN f.doc_id <> firsts.first_id THEN 'dedup'
         |       WHEN contam.n_overlap > 0 THEN 'decontaminated'
         |       ELSE 'kept' END AS drop_stage
         | FROM f LEFT JOIN firsts ON f.th = firsts.th
         |        LEFT JOIN contam ON contam.doc_id = f.doc_id)
         |SELECT doc_id, drop_stage,
         | CAST(CASE WHEN drop_stage = 'kept' THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM sel ORDER BY doc_id""".stripMargin
    },
    "cur_split" ->
      s"""WITH b AS (SELECT doc_id, source, lang,
         |  CAST('0x' || substring(md5(text), 1, 12) AS BIGINT) % 100 AS bucket
         | FROM documents)
         |SELECT doc_id, source, lang, bucket,
         | CASE WHEN bucket < $SplitTrainPct THEN 'train'
         |      WHEN bucket < ${SplitTrainPct + SplitValPct} THEN 'val'
         |      ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    // The whole fit replayed: three unrolled GD iterations, each one
    // corpus aggregation with the previous weights as scalars, rounded
    // to 9 decimals at every step exactly like the engine (the sync
    // point that absorbs cross-engine float-summation-order ulps).
    "cur_quality_lr_fit" ->
      s"""WITH f AS (SELECT
         |   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |   least(n_chars / 500.0, 1.0) AS x1,
         |   CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))
         |     AS DOUBLE) / len(string_split(text, ' ')) AS x2,
         |   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |     / len(string_split(text, ' ')) AS x3
         |  FROM documents),
         |w1 AS (SELECT
         |   round(-avg(0.5 - y), $LrSyncScale) AS b,
         |   round(-avg((0.5 - y) * x1), $LrSyncScale) AS a1,
         |   round(-avg((0.5 - y) * x2), $LrSyncScale) AS a2,
         |   round(-avg((0.5 - y) * x3), $LrSyncScale) AS a3
         |  FROM f),
         |p1 AS (SELECT f.*, w1.b AS b, w1.a1 AS a1, w1.a2 AS a2, w1.a3 AS a3,
         |   1.0 / (1.0 + exp(-(w1.b + w1.a1 * x1 + w1.a2 * x2 + w1.a3 * x3))) AS p
         |  FROM f, w1),
         |w2 AS (SELECT
         |   round(max(b) - avg(p - y), $LrSyncScale) AS b,
         |   round(max(a1) - avg((p - y) * x1), $LrSyncScale) AS a1,
         |   round(max(a2) - avg((p - y) * x2), $LrSyncScale) AS a2,
         |   round(max(a3) - avg((p - y) * x3), $LrSyncScale) AS a3
         |  FROM p1),
         |p2 AS (SELECT f.*, w2.b AS b, w2.a1 AS a1, w2.a2 AS a2, w2.a3 AS a3,
         |   1.0 / (1.0 + exp(-(w2.b + w2.a1 * x1 + w2.a2 * x2 + w2.a3 * x3))) AS p
         |  FROM f, w2),
         |w3 AS (SELECT
         |   round(max(b) - avg(p - y), $LrSyncScale) AS b,
         |   round(max(a1) - avg((p - y) * x1), $LrSyncScale) AS a1,
         |   round(max(a2) - avg((p - y) * x2), $LrSyncScale) AS a2,
         |   round(max(a3) - avg((p - y) * x3), $LrSyncScale) AS a3
         |  FROM p2),
         |p3 AS (SELECT f.y, w3.b AS b, w3.a1 AS a1, w3.a2 AS a2, w3.a3 AS a3,
         |   1.0 / (1.0 + exp(-(w3.b + w3.a1 * x1 + w3.a2 * x2 + w3.a3 * x3))) AS p
         |  FROM f, w3)
         |SELECT round(max(b), 6) AS w_intercept, round(max(a1), 6) AS w_len_score,
         | round(max(a2), 6) AS w_stop_ratio, round(max(a3), 6) AS w_uniq_ratio,
         | round(avg(CASE WHEN (CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END) = y
         |   THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy
         |FROM p3""".stripMargin,
    "cur_shard_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
         |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
         |    AS skey FROM documents),
         |s AS (SELECT doc_id, skey, skey % $NumShards AS shard FROM k)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         | CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
         |   AS BIGINT) AS pos
         |FROM s ORDER BY shard, pos""".stripMargin,
    "cur_mix_sources" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |p AS (SELECT source, sum(n_tokens) AS src_tokens FROM d GROUP BY 1),
        |m AS (SELECT min(src_tokens) AS min_tokens FROM p),
        |r AS (SELECT source, min_tokens * 256 // src_tokens AS keep_bar
        |      FROM p CROSS JOIN m)
        |SELECT doc_id, source, n_tokens
        |FROM d JOIN r USING (source)
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
        |  < keep_bar
        |ORDER BY doc_id""".stripMargin,
    "cur_dup_ngram_frac" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text, ' ')) - 2),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |        || ' ' || string_split(text, ' ')[i+2])) AS sh FROM documents),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM t),
        |f AS (SELECT s, count(*) AS df FROM e GROUP BY 1),
        |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
        |        FROM e JOIN f USING (s) WHERE df >= 2 GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
        | CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup,
        | CASE WHEN len(sh) > 0
        |   THEN round(CAST(coalesce(dup.n_dup, 0) AS DOUBLE) / len(sh), 4) END AS dup_frac
        |FROM t LEFT JOIN dup USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "cur_tfidf_topterms" ->
      """WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        | FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        | FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "cur_pack" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
         |    % $NumPackShards AS shard
         | FROM documents),
         |c AS (SELECT doc_id, lang, shard, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         | FROM t)
         |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
         | CAST(cum_before // $PackWindow AS BIGINT) AS bin_id,
         | CAST(cum_before % $PackWindow AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin)
}
