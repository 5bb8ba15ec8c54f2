package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the scale properties claimed in SURVEY §5
  * must be visible in the optimized physical plans, not just intended.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q6: filters are pushed to the parquet scan") {
    // executedPlan.toString truncates the PushedFilters list, so assert
    // on the untruncated formatted explain output.
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, sf)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("GreaterThanOrEqual(l_discount"), p)
  }

  test("q6: scan reads only the five needed columns") {
    val p = planOf("q6_forecast_revenue")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey"), s"over-read: $readSchema")
    assert(!readSchema.contains("l_returnflag"), s"over-read: $readSchema")
  }

  test("q3/q5: dimension joins are broadcast") {
    assert(planOf("q3_shipping_priority").contains("BroadcastHashJoin"))
    val q5 = planOf("q5_local_supplier_volume")
    assert(q5.contains("BroadcastHashJoin"))
    // the fact-fact join (lineitem x orders) must NOT be a nested loop
    assert(!q5.contains("CartesianProduct") && !q5.contains("BroadcastNestedLoopJoin"))
  }

  test("q1: aggregation is partial (map-side combine before exchange)") {
    val p = planOf("q1_pricing_summary")
    // two HashAggregates around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("cur_source_cap: bounded-heap aggregate, no per-source window sort") {
    // a hot domain must never serialize one task's window sort: the
    // plan is a partial+final TopKIds aggregation plus a broadcast
    // join-back — no Window node over source anywhere.
    val p = planOf("cur_source_cap")
    assert(!p.contains("Window"), s"per-source window sort resurfaced\n$p")
    assert(p.toLowerCase.contains("topkids"), s"expected the TopKIds heap aggregate\n$p")
    assert(p.contains("BroadcastHashJoin"), s"keep-list join-back must broadcast\n$p")
  }

  test("round-7 analytics family: scale-posture plan shapes") {
    // q39 CDC compaction: arg-max hash aggregation, never a per-key
    // window sort over the change log
    val cdc = planOf("q39_cdc_apply")
    assert(!cdc.contains("Window"), s"q39 grew a window sort\n$cdc")
    // weighted sampling + KMV sketch: bounded-heap aggregate, no
    // global sort of the corpus (TakeOrdered of k rows is fine)
    Seq("cur_weighted_sample", "q38_kmv_distinct").foreach { q =>
      val p = planOf(q)
      assert(p.toLowerCase.contains("topkids"), s"$q lost the heap aggregate\n$p")
      assert(!p.contains("Window"), s"$q sorts globally via a window\n$p")
    }
    // HLL sketch: pure hash aggregations (distinct → 256 registers →
    // scalar), never a window or per-register sort
    val hll = planOf("q47_hll_distinct")
    assert(!hll.contains("Window") && !hll.contains("CartesianProduct"),
      s"q47 plan regressed\n$hll")
    assert(hll.contains("HashAggregate"), s"q47 lost hash aggregation\n$hll")
    // HLL set algebra: pure hash aggregations + the tagged-union
    // combine — never a window, cartesian, or nested loop
    val hs = planOf("q49_hll_setops")
    assert(!hs.contains("Window") && !hs.contains("CartesianProduct")
      && !hs.contains("BroadcastNestedLoopJoin"), s"q49 plan regressed\n$hs")
    assert(hs.contains("HashAggregate"), s"q49 lost hash aggregation\n$hs")
    // triangle counting: the wedge side must never be a hash-map
    // build side (only shuffled-hash joins with bounded builds, no
    // nested loop, no window)
    val tri = planOf("q48_triangles")
    assert(tri.contains("ShuffledHashJoin"), s"q48 lost shuffled-hash joins\n$tri")
    assert(!tri.contains("CartesianProduct") && !tri.contains("BroadcastNestedLoopJoin")
      && !tri.contains("Window"), s"q48 plan regressed\n$tri")
    // retention / funnel-family aggregates: no window over the raw
    // event stream (per-user and dimension aggs only)
    Seq("q32_retention", "q43_cumulative_users", "q45_sliding_distinct").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested loop\n$p")
    }
    // market basket: the pair top-k must be TakeOrdered (per-partition
    // heaps), not a global sort
    assert(planOf("q33_market_basket").contains("TakeOrderedAndProject"))
  }

  test("q37_pagerank: zero non-broadcast exchange anywhere (broadcast iterations)") {
    // The iteration contract since the r12 shared-adjacency build:
    // the edge list is the STAMPED hash-partitioned checkpoint
    // (coPurchaseAdjacency — a Scan ExistingRDD carrying
    // HashPartitioning(n)), every per-round join is a broadcast of
    // the node-bounded contribution table against it, and the dst
    // aggregation is partition-local on the stamped layout — so the
    // whole q37 plan contains NO shuffle at all, only broadcasts
    // (the one corpus exchange lives inside the shared build, paid
    // once per dataset). A shuffle appearing here means the
    // checkpoint lost its partitioning stamp or a join reverted.
    val p = planOf("q37_pagerank")
    assert(p.contains("Scan ExistingRDD"), s"shared adjacency scan missing\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val bad = p.linesIterator.filter(l =>
      l.contains("ShuffledHashJoin") ||
        (l.contains("Exchange") && !l.contains("BroadcastExchange")
          && !l.contains("ReusedExchange"))).toVector
    assert(bad.isEmpty, s"shuffle in the iteration plan:\n${bad.mkString("\n")}\n$p")
  }

  test("q37_pagerank: node count above the cap flips iterations to shuffle-hash automatically") {
    // Force the flip with cap=0: the per-iteration contribution joins
    // must plan as ShuffledHashJoin (no broadcast of a node table the
    // executors could not hold), and the RESULT must be identical to
    // the broadcast regime — the strategy is a physical choice only.
    val forced = operators.Relational.q37PagerankAt(spark, sf, 0L)
    val p = forced.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"),
      s"node-table broadcast above the cap:\n$p")
    val broadcastRegime = SparkEntry.queries("q37_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val shuffleRegime = forced.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(shuffleRegime == broadcastRegime)
  }

  test("q48/q50: graph queries reuse the shared adjacency checkpoint") {
    // Both consumers must read the checkpointed adjacency (Scan
    // ExistingRDD), not rebuild the lineitem self-join — rebuilds
    // would show a shuffle-hash join of two parquet scans.
    Seq("q48_triangles", "q50_label_propagation").foreach { q =>
      val p = planOf(q)
      assert(p.contains("Scan ExistingRDD"), s"$q lost the shared adjacency\n$p")
      assert(!p.toLowerCase.contains("parquet"), s"$q rebuilds the graph from parquet\n$p")
    }
    // q50 broadcast regime: per-round aggregations partition-local on
    // the stamped layout — the only non-broadcast exchanges are the
    // bounded label-census tail (lbl agg, size agg, final sort), never
    // a per-round shuffle (which would add two exchanges per round).
    val p50 = planOf("q50_label_propagation")
    val bad = p50.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("ReusedExchange")).toVector
    assert(bad.size <= 3, s"per-round shuffle in the q50 plan:\n${bad.mkString("\n")}\n$p50")
  }

  test("text_bpe_tokens: broadcast dictionary join, fitted vocab as literal, no window") {
    // Apply-side plan only: the vocab fit collects its 48 grams at
    // construction (bounded model state, the IVF-centroid
    // convention), so the returned plan must carry the vocab as a
    // literal — no Window/row_number, no fit subtree — and the
    // distinct-word subword table joins back by BROADCAST (a subword
    // dictionary is small by construction, even at 100 TB).
    val p = planOf("text_bpe_tokens")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_prefix_filter: hashed 8-byte keys, no broadcast, no cartesian") {
    val p = planOf("dedup_prefix_filter")
    assert(p.contains("xxhash64"), s"prefix filter must shuffle hashed keys\n$p")
    assert(!p.contains("BroadcastExchange"), s"corpus-sized side broadcast\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cur_eval_overlap: eval side broadcast, corpus never shuffles for candidates") {
    val p = planOf("cur_eval_overlap")
    assert(p.contains("BroadcastHashJoin"), s"eval gram set must broadcast\n$p")
  }

  test("ann_incremental: kernel assignment in plan, no cartesian, no corpus broadcast") {
    val p = planOf("ann_incremental_topk")
    assert(p.contains("MapPartitions"), s"expected the kernel cell assignment\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup jaccard: no cartesian product anywhere") {
    val p = planOf("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("map-heavy queries evaluate their projection above the final sort") {
    // The range exchange of a global sort samples its child, so a
    // projection below the sort runs twice. The map-heavy queries sort
    // their raw inputs first; the heavy expression must appear ABOVE
    // the rangepartitioning exchange in the plan (nothing in Catalyst
    // pushes a Project below a Sort today — this pins that).
    def heavyAboveSort(q: String, needle: String): Unit = {
      val p = planOf(q)
      val exchangeAt = p.indexOf("rangepartitioning")
      // LAST occurrence: the plan prints top-down, so the assertion
      // must also fail when the heavy expression appears BOTH above
      // and below the exchange (a duplicated projection is exactly the
      // double-evaluation this test pins against).
      val heavyAt = p.lastIndexOf(needle)
      assert(exchangeAt >= 0, s"$q: no range exchange in plan:\n$p")
      assert(heavyAt >= 0, s"$q: expression '$needle' not in plan:\n$p")
      assert(heavyAt < exchangeAt,
        s"$q: '$needle' is evaluated below the sort (sampled twice):\n$p")
    }
    heavyAboveSort("cur_pii_redact", "regexp_replace")
    heavyAboveSort("etl_flatten_json", "get_json_object")
    heavyAboveSort("etl_judge_json_parse", "regexp_extract")
    heavyAboveSort("text_stem", "transform")
    heavyAboveSort("mm_resize", "concat_ws")
  }

  test("text ops scan only text and doc_id") {
    val p = planOf("text_fingerprint")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"), readSchema)
  }

  test("bucketed table: aggregation on the bucket key needs no exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    // the warehouse dir outlives the (per-JVM derby) metastore — clear
    // the stale location or saveAsTable refuses to create the table
    val loc = new java.io.File("/tmp/graft-warehouse/li_bucketed")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    sources.Sinks.writeBucketedTable(
      sources.Tables.lineitem(spark, sf), "li_bucketed", "l_orderkey", 8)
    val t = spark.table("li_bucketed")
    val agg = t.groupBy("l_orderkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    // bucketed layout satisfies the aggregation's distribution: the
    // plan must contain no shuffle at all
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(agg.count() > 0)
  }

  test("bucketed tables: co-located fact-fact join runs with zero exchange") {
    // The 100 TB payoff of bucketing: two fact tables pre-bucketed on
    // the join key with the SAME bucket count join with no shuffle on
    // either side. Broadcast is disabled for the assertion — at real
    // scale neither side fits, and the point is the exchange-free
    // sort-merge join over co-located buckets.
    Seq("li_bucketed2", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    sources.Sinks.writeBucketedTable(
      sources.Tables.lineitem(spark, sf), "li_bucketed2", "l_orderkey", 8)
    sources.Sinks.writeBucketedTable(
      sources.Tables.orders(spark, sf)
        .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bucketed", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed2")
        .join(spark.table("ord_bucketed"), "l_orderkey")
        .groupBy("o_orderstatus").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // join + partial agg consume the bucket distribution directly;
      // the only exchange allowed is the final tiny status roll-up
      val joinSide = plan.split("SortMergeJoin")(1)
      assert(!joinSide.contains("Exchange hashpartitioning"), plan)
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup_substring: content+doc hash exchanges only, no nested loop, no corpus broadcast") {
    // Design: the global keep-first is the argmax aggregation
    // (gh exchange with map-side partial), the salted mark join (a
    // (gh, kf_salt) exchange of the gram stream plus one of the
    // duplicated-hash-sized firsts x S build — the ONLY exchange that
    // is not corpus- or doc-keyed, and it is dup-key-bounded), then
    // doc_id-local aggregates on ONE doc_id exchange plus the scan
    // side of the doc_id join-back. Anything beyond 5 hash exchanges
    // means a doc-local stage re-shuffled; a BroadcastExchange means
    // a corpus-sized side (span table or firsts table) was broadcast.
    val p = planOf("dedup_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join:\n$p")
    assert(!p.contains("BroadcastExchange"), s"corpus-sized side broadcast:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 5, s"$hashEx hash exchanges, expected <= 5:\n$p")
  }

  test("keep-first dedup rows: no Window partitioned by a content key") {
    // The scale hazard the argmax rewrite removes: a row_number()
    // window PARTITION BY block/gh funnels every occurrence of a hot
    // boilerplate key into ONE task's sort, and AQE's skew handling
    // splits skewed JOIN partitions only — never WindowExec. The only
    // windows allowed in these plans are the doc_id-local
    // gaps-and-islands frames; a window keyed by block content or
    // window hash means the hazard came back.
    Seq("dedup_paragraph", "dedup_substring", "dedup_substring_incremental").foreach { q =>
      val p = planOf(q)
      val windowLines = p.linesIterator.filter(_.contains("Window")).toVector
      windowLines.foreach { l =>
        assert(!l.contains("block") && !l.contains("gh#"),
          s"$q: content-keyed window resurfaced:\n$l\n$p")
      }
      // dedup_paragraph has no doc-local window at all
      if (q == "dedup_paragraph")
        assert(windowLines.isEmpty, s"$q grew a window:\n$p")
      // the mark join is SALTED: its shuffle keys carry kf_salt, so a
      // hot content key spreads across KeepFirstSaltBuckets tasks by
      // construction (AQE's skew rule cannot fire on this join — the
      // build side's final aggregate sits above its exchange)
      assert(p.contains("kf_salt"), s"$q: mark join lost its salt:\n$p")
    }
  }

  test("no unintentional nested-loop joins anywhere in the inventory") {
    // ann_bruteforce_topk intentionally nested-loops 10 broadcast query
    // vectors against the table (its whole point is the exact scan);
    // the ann recall gates cross single-row aggregates (scalar
    // measurements), as do q24 and cur_tfidf_topterms (scalar
    // subquery) and the LM/PMI text scores (corpus-total scalars
    // broadcast onto the token stream). IVF cell assignment itself is
    // join-free now (literal centroids) but its recall row inherits
    // the gate crosses.
    val allowNestedLoop =
      // ann_matryoshka_topk: the same intentional broadcast-query
      // exact scan as ann_bruteforce_topk (it IS the recall baseline)
      Set("ann_bruteforce_topk", "ann_matryoshka_topk",
        // ann_matryoshka_rerank: pass 1 is the same intentional
        // broadcast-query scan, over the 16-dim prefix only
        "ann_matryoshka_rerank",
        // ann_mmr_diversify: candidate generation is the same
        // intentional broadcast-query exact scan; selection after it
        // is per-query local (kernel), join-free
        "ann_mmr_diversify",
        "ann_range_search", "ann_hard_negatives",
        // ann_binary_topk/_recall: stage 1 is the intentional
        // broadcast-query scan over 8-byte signatures (the binary
        // index's whole point); the cut before the exchange is the
        // WindowGroupLimit pair pinned in its own plan test
        "ann_binary_topk", "ann_binary_recall",
        "ann_lsh_recall", "ann_ivf_recall", "ann_multiprobe_recall",
        "ann_pq_recall", "ann_ivfpq_recall", "ann_filtered_ivfpq_recall",
        // ann_upsert_recall: the same single-row gate-scalar cross as
        // the other recall gates
        "ann_upsert_recall",
        "dedup_semantic_gate", "q24_revenue_share",
        // text_lm_kn/_kn3/_kn5: same corpus-total-scalar (T types)
        // broadcast onto the gram-type table as the LM/PMI rows
        "cur_tfidf_topterms", "text_lm_score", "text_lm_kn", "text_lm_kn3",
        "text_lm_kn5", "text_pmi_bigrams", "text_llr_bigrams",
        // slice-total scalar pair broadcast onto the token-count table
        "text_drift_jsd",
        // scalar avgdl aggregate broadcast onto the term stream —
        // the same share-of-total shape as the LM/PMI rows above
        "text_bm25_topk",
        // scalar/bounded broadcasts: hybrid's avgdl total, DSIR's
        // gram totals + one-row keep-list, ccnet's inherited LM totals
        "ann_hybrid_rrf", "cur_dsir", "cur_ccnet_buckets")
    SparkEntry.queries.keys.filterNot(allowNestedLoop).foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("dedup family: no corpus-sized broadcast, no nested loop (100 TB posture)") {
    // The pair-generating and verify joins in every dedup path must be
    // shuffle joins: every broadcastable side here (shingle arrays,
    // band/block tables, the embedding corpus) grows with the corpus.
    // dedup_exact has no join at all; the others must show zero
    // BroadcastExchange nodes in the static plan.
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_embedding_cosine", "dedup_semantic", "dedup_incremental",
        "dedup_incremental_minhash").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("BroadcastExchange"), s"$q broadcasts a corpus-sized side:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join")
    }
  }

  test("dedup_embedding_cosine: distributed block-pair scan, no driver collect") {
    // the block-pair rewrite must keep the whole scan declarative —
    // codegen'd DotProduct inside a shuffle join, no RDD collect/scan
    // nodes (the old shape was mapPartitions over a driver collect()).
    val p = planOf("dedup_embedding_cosine")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.toLowerCase.contains("dotproduct"), p)
    assert(!p.contains("Scan ExistingRDD"), s"driver-side materialization leaked into the plan:\n$p")
  }

  test("dedup_ngram_jaccard: posting lists are DF-capped before the self-join") {
    // the capped index is eagerly materialized inside the query (its
    // filter doesn't survive into the final analyzed plan), so assert
    // on the index builder's own plan.
    import org.apache.spark.sql.functions.{col, explode}
    val ex = operators.Dedup.shingled(spark, sf)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val analyzed = operators.Dedup.cappedIndex(ex).queryExecution.analyzed.toString
    val capFilter = s"<= (cast\\()?${operators.Dedup.DfCap}".r
    assert(capFilter.findFirstIn(analyzed).isDefined,
      s"no df <= ${operators.Dedup.DfCap} filter in:\n$analyzed")
  }

  test("jaccard self-join: sort-merge + AQE skew handling (residual-skew posture)") {
    // After the DF cap, residual skew on medium-frequency shingles is
    // bounded (any key contributes <= DfCap rows per side), and the
    // candidate join must be the shape AQE's skew-join optimization
    // can act on at scale: a sort-merge join with adaptive execution
    // and skew handling enabled.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    import org.apache.spark.sql.functions.{col, explode}
    val ex = operators.Dedup.shingled(spark, sf)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val capped = operators.Dedup.cappedIndex(ex)
    val selfJoin = capped.hint("merge").as("a").join(capped.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    val p = selfJoin.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("hot paths run inside WholeStageCodegen spans") {
    // the scan→filter→project→partial-agg pipeline of the headline
    // queries must be fused into codegen stages, not interpreted
    // operators (the custom DotProduct participates via doGenCode).
    // AQE wraps stages and only inserts codegen nodes at execution;
    // disabling it for the assertion exposes the static codegen spans.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("q1_pricing_summary", "q6_forecast_revenue", "text_quality_score",
          "dedup_embedding_cosine").foreach { q =>
        // codegen spans render as "*(n) Operator" in plan toString
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        assert(p.contains("*("), s"$q has no WholeStageCodegen span:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("similarity: custom DotProduct expression is in the plan (codegen path)") {
    val p = planOf("ann_bruteforce_topk")
    assert(p.contains("dotproduct") || p.contains("DotProduct"), p)
  }

  test("binary ANN: stage-1 cut is a WindowGroupLimit pair; scan scores via DotProduct") {
    val p = planOf("ann_binary_topk")
    // the per-query rerank-depth cut must pre-prune map-side
    // (Partial) before the exchange and finish after it (Final) —
    // without the pushdown every corpus row reaches the window sort
    assert(p.contains("WindowGroupLimit"), s"rank cut not pushed down\n$p")
    assert(p.contains("dotproduct") || p.contains("DotProduct"),
      s"asymmetric scoring lost the codegen'd DotProduct\n$p")
    // the signature build is a typed kernel, not an interpreted lambda
    assert(!p.contains("aggregate(sequence"), s"interpreted sig lambda resurfaced\n$p")
  }

  test("shingling is a typed kernel, no interpreted lambda in its plan") {
    // the transform(sequence(...)) shingle expression can never enter
    // codegen and costs a cold-interpreter storm at scale (measured
    // ~350s at the 100x probe). Downstream dedup plans hide the
    // subtree behind a checkpoint, so assert on the shingle frame's
    // own physical plan.
    val p = operators.Dedup.shingled(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("transform(sequence"), s"interpreted shingle lambda resurfaced\n$p")
    assert(p.contains("MapPartitions"), s"expected a typed shingle kernel in the plan\n$p")
  }

  test("ann recall gates: hit-check is a literal-map lookup, not a join (one-pass gate)") {
    // the gate's only join must be the final single-row broadcast
    // cross-join assembling the corpus scalars with the candidate
    // scalars; ground truth is an in-plan literal, so no semi-join and
    // no second window/ranking branch may appear.
    for (q <- Seq("ann_lsh_recall", "ann_ivf_recall", "ann_pq_recall")) {
      val p = planOf(q)
      assert(!p.contains("LeftSemi"), s"$q: ground-truth semi-join resurfaced\n$p")
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
        s"$q: more than the single scalar-assembly cross join\n$p")
      // exactly one ranking Window node (the candidate top-k); the old
      // shape ranked twice (gate + separate brute-force branch). The
      // "Window \[" form avoids counting WindowGroupLimit rank-pushdown
      // nodes, which legitimately appear in partial+final pairs.
      assert("Window \\[".r.findAllIn(p).size <= 1,
        s"$q: multiple window branches\n$p")
    }
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact scan") {
    // The dominant scan-pruning mechanism for hive-partitioned layouts
    // at 100 TB: a date-partitioned fact joined through a filtered dim
    // must plan a dynamicpruningexpression partition filter on the
    // fact scan (fed by the reused dim broadcast), so only the
    // partitions matching the dim filter are ever listed/read. The dim
    // is written to parquet — a filter over an in-memory LocalRelation
    // would be constant-folded away before the PartitionPruning rule
    // looks for a selective predicate.
    import org.apache.spark.sql.functions._
    val factPath = "/tmp/graft-dpp-fact"
    val dimPath = "/tmp/graft-dpp-dim"
    sources.Sinks.writePartitionedParquet(
      sources.Tables.orders(spark, sf)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM")),
      factPath, "o_month")
    val fact = spark.read.parquet(factPath)
    import spark.implicits._
    val months = fact.select(col("o_month").cast("string")).distinct()
      .as[String].collect().sorted
    assert(months.length > 10, s"fact should span many partitions, got ${months.length}")
    sources.Sinks.writePartitionedParquet(
      months.zipWithIndex.toSeq.toDF("m_month", "m_idx")
        .withColumn("m_kind", when(col("m_idx") < 2, lit("target")).otherwise(lit("rest"))),
      dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("m_kind") === "target")
    val q = fact.join(broadcast(dim), col("o_month") === col("m_month"))
      .groupBy(col("o_month")).agg(count(lit(1)).as("n"))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { q.explain("formatted") }
    val p = out.toString
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic pruning filter on the fact scan:\n$p")
    // and the pruned query is correct: exactly the two target months
    val got = q.collect().map(r => r.getString(0)).sorted
    assert(got.toSeq == months.take(2).toSeq, got.mkString(","))
  }

  test("q28_dpp_join: the GATED query plans dynamic partition pruning") {
    // Same mechanism as above, but on the driver-gated inventory row:
    // the quarter predicate exists only on the dim side, so the fact
    // scan's partition cut can come only from the DPP subquery.
    val q = operators.Relational.queries("q28_dpp_join")(spark, sf)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { q.explain("formatted") }
    assert(out.toString.contains("dynamicpruningexpression"),
      s"q28 fact scan not dynamically pruned:\n${out.toString}")
    val rows = q.collect()
    // one row per month of the target quarter, months within the quarter
    assert(rows.nonEmpty && rows.length <= 3, rows.length.toString)
    rows.foreach { r =>
      val m = r.getAs[String]("o_month")
      assert(m >= "1995-01" && m <= "1995-03", m)
      assert(r.getAs[Long]("n_orders") > 0L)
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // The runtime half of the skew story: the engine's own dedup joins
    // bound skew statically (DfCap caps any key's fan-out), but a
    // user-supplied join key can still be arbitrarily hot — that case
    // is delegated to AQE's skew-join optimization, so prove the
    // delegation actually works end-to-end: a 90%-one-key join must
    // execute as SortMergeJoin(skew=true) in the final adaptive plan.
    // Thresholds are lowered to test scale; the mechanism (median-vs-
    // factor detection, split + replicate) is the same one that acts
    // on multi-GB partitions on a cluster.
    import org.apache.spark.sql.functions._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.get(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
      // 90% of the left side lands on key 0; the rest spread thin
      val left = spark.range(200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(2000).select(col("id").as("k"), lit(1L).as("rv"))
      val q = left.join(right, "k").select(sum(length(col("payload"))).as("s"))
      // collect() (not head()) so THIS QueryExecution runs — head()
      // executes a separate limited plan and leaves q's unexecuted.
      assert(q.collect()(0).getLong(0) > 0)
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the skewed join split:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"no skewed shuffle read in the final plan:\n$finalPlan")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("cur_pipeline: argmax keep-first (no window), broadcast decontamination probe") {
    val p = planOf("cur_pipeline")
    // keep-first must be the min(struct)-style aggregation + join-back,
    // never a content-keyed window rank (the Dedup keep-first hazard)
    assert(!p.contains("Window"), s"window rank in the pipeline plan:\n$p")
    // eval gram set is the broadcast build side of the contamination
    // probe; the corpus-sized sides stay hash-joined (no sorts)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
