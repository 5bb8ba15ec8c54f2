package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pii redact: no raw PII survives, placeholders present, counts positive") {
    val rows = Curation.curPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.contains("@example.com"), red)
      assert(!red.contains("https://"), red)
      assert(red.contains("[EMAIL]") && red.contains("[URL]"), red)
      // every doc gets at least email + url; ssn/phone per the id mod
      val id = r.getAs[Long]("doc_id")
      val expected = 2L + (if (id % 3 == 0) 1 else 0) + (if (id % 2 == 0) 1 else 0)
      assert(r.getAs[Long]("n_pii") == expected, s"doc $id")
      if (id % 3 == 0) assert(red.contains("[SSN]"), red)
      if (id % 2 == 0) assert(red.contains("[PHONE]"), red)
    }
  }

  test("decontaminate: eval docs excluded; flag equals overlap > 0") {
    val rows = Curation.curDecontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 20 != 0)
      assert((r.getAs[Long]("contaminated") == 1L) == (r.getAs[Long]("n_overlap") > 0L))
    }
  }

  test("repetition: fractions in [0,1], keep consistent with thresholds") {
    val rows = Curation.curRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val mt = r.getAs[Double]("max_tok_frac")
      val t2 = r.getAs[Double]("top_2gram_frac")
      val d3 = r.getAs[Double]("dup_3gram_frac")
      Seq(mt, t2, d3).foreach(v => assert(v >= 0.0 && v <= 1.0))
      val keep = r.getAs[Long]("keep")
      assert((keep == 1L) == (mt <= 0.11 && t2 <= 0.05 && d3 <= 0.1))
      kept += keep.toInt
    }
    // thresholds were calibrated to actually split the corpus
    assert(kept > 0 && kept < rows.length)
  }

  test("chunk: windows tile each document with the configured stride") {
    val byDoc = Curation.curChunk(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("nt")).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, chunks) =>
      val nt = docs(id)
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.head.getAs[Long]("chunk_id") == 0L)
      // every chunk except possibly the last is full-size; the windows
      // cover the document: last start + its size reaches nt
      sorted.init.foreach(c => assert(c.getAs[Long]("n_chunk_tokens") == Curation.ChunkSize))
      val last = sorted.last
      val lastStart = last.getAs[Long]("chunk_id") * Curation.ChunkStride
      assert(lastStart + last.getAs[Long]("n_chunk_tokens") == nt.toLong)
      val expected = if (nt <= Curation.ChunkSize) 1L
        else math.ceil((nt - Curation.ChunkSize).toDouble / Curation.ChunkStride).toLong + 1
      assert(sorted.length.toLong == expected, s"doc $id nt=$nt")
    }
  }

  test("stratified sample: keys below per-language threshold, en downsampled harder") {
    val rows = Curation.curSampleStratified(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val thr = if (r.getAs[String]("lang") == "en") "33" else "7f"
      assert(r.getAs[String]("sample_key") <= thr)
    }
    val total = sources.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val keptEn = rows.count(_.getAs[String]("lang") == "en").toDouble / total("en")
    // 20% nominal for en, 50% for the rest — loose bounds, small sample
    assert(keptEn < 0.4, s"en keep rate $keptEn")
  }

  test("tfidf: ranks are 1..3 per doc with non-increasing scores") {
    val byDoc = Curation.curTfidfTopterms(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores == scores.sorted.reverse, s"doc $id scores not descending")
    }
  }

  test("bloom decontamination agrees with the exact variant (no FP at this ratio)") {
    val exact = Curation.curDecontaminate(spark, sf).collect().map(_.toSeq).toSeq
    val bloom = Curation.curDecontaminateBloom(spark, sf).collect().map(_.toSeq).toSeq
    assert(bloom == exact)
  }

  test("keep list: verdicts consistent with the individual signals") {
    val keepList = Curation.curKeepList(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("reason"), r.getAs[Long]("keep"))).toMap
    assert(keepList.nonEmpty)
    // one verdict per document
    assert(keepList.size == sources.Tables.documents(spark, sf).count())
    // keep=1 iff reason is ok
    keepList.values.foreach { case (reason, keep) =>
      assert((keep == 1L) == (reason == "ok"), s"$reason/$keep")
    }
    // every eval row is excluded as holdout
    keepList.foreach { case (id, (reason, _)) =>
      if (id % 20 == 0) assert(reason == "eval_holdout", s"doc $id: $reason")
    }
    // kept docs really are canonical / clean / non-repetitive
    val rep = Curation.curRepetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap
    val dec = Curation.curDecontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("contaminated")).toMap
    keepList.foreach { case (id, (reason, keep)) =>
      if (keep == 1L) {
        assert(rep.get(id).forall(_ == 1L), s"kept doc $id is repetitive")
        assert(dec.get(id).forall(_ == 0L), s"kept doc $id is contaminated")
      }
      if (reason == "repetitive") assert(rep(id) == 0L)
      if (reason == "contaminated") assert(dec(id) == 1L)
    }
    // the pipeline must actually drop something and keep something
    val reasons = keepList.values.map(_._1).toSet
    assert(reasons.contains("ok") && reasons.contains("eval_holdout"), reasons.toString)
  }

  test("mix sources: keep bars equalize token budgets; sample is the hash filter") {
    val rows = Curation.curMixSources(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the per-source bars independently
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("nt")))
    val perSrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val minT = perSrc.values.min
    val bars = perSrc.view.mapValues(t => minT * 256 / t).toMap
    def keyByte(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16)
    }
    val expected = docs.filter { case (id, src, _) => keyByte(id) < bars(src) }
      .map(_._1).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected)
    // the smallest source keeps everything (bar = 256 > any hash byte)
    val minSrc = perSrc.minBy(_._2)._1
    val keptBySrc = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(keptBySrc(minSrc) == docs.count(_._2 == minSrc))
    // and at least one over-budget source was actually downsampled
    assert(docs.groupBy(_._2).exists { case (s2, ds) =>
      keptBySrc.getOrElse(s2, 0) < ds.length })
  }

  test("dup ngram frac: counts match an independent df recomputation") {
    val rows = Curation.curDupNgramFrac(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent recomputation of shingle document frequencies
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val byDoc = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val df2 = byDoc.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sh = byDoc(id)
      val nDup = sh.count(s2 => df2(s2) >= 2).toLong
      assert(r.getAs[Long]("n_shingles") == sh.size.toLong, s"doc $id")
      assert(r.getAs[Long]("n_dup") == nDup, s"doc $id")
      if (sh.nonEmpty) {
        // Spark round() is HALF_UP on the decimal value, not rint
        val exp = BigDecimal(nDup.toDouble / sh.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("dup_frac") == exp, s"doc $id")
      }
    }
    // the signal must separate documents on this corpus
    val fracs = rows.filter(!_.isNullAt(3)).map(_.getAs[Double]("dup_frac")).distinct
    assert(fracs.length > 1)
  }

  test("pack: offsets consistent with per-(lang, shard) running sum") {
    val rows = Curation.curPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // two-level packing: bins compose within each (lang, shard)
    val groups = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
    assert(groups.size > rows.map(_.getAs[String]("lang")).distinct.length,
      "sharding should split languages into multiple pack partitions")
    groups.foreach { case ((_, shard), docs) =>
      assert(shard >= 0 && shard < Curation.NumPackShards)
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("bin_id") == cum / Curation.PackWindow)
        assert(r.getAs[Long]("bin_offset") == cum % Curation.PackWindow)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("ccnet buckets: thresholds split the corpus, census exact, tail dropped") {
    val rows = Curation.curCcnetBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBucket.size >= 2, "thresholds must actually split this corpus")
    rows.foreach { r =>
      val x = r.getAs[Double]("xent")
      val b = r.getAs[String]("bucket")
      val expected =
        if (x < Curation.CcnetHeadBar) "head"
        else if (x < Curation.CcnetMiddleBar) "middle"
        else "tail"
      assert(b == expected)
      assert((r.getAs[Long]("keep") == 1L) == (b != "tail"))
      assert(r.getAs[Long]("bucket_docs") == byBucket(b).length.toLong)
    }
  }

  test("keep-best: one survivor per cluster, the longest member, sizes exact") {
    val rows = Curation.curDedupKeepBest(spark, sf).collect()
    val chars = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    assert(rows.length == chars.size)
    val clusters = rows.groupBy(_.getAs[Long]("cluster_rep"))
    assert(clusters.exists(_._2.length > 1), "corpus should contain a real cluster")
    clusters.foreach { case (rep, ms) =>
      val ids = ms.map(_.getAs[Long]("doc_id"))
      assert(rep == ids.min, "representative is the min member id")
      ms.foreach(r => assert(r.getAs[Long]("cluster_size") == ms.length.toLong))
      val kept = ms.filter(_.getAs[Long]("kept") == 1L)
      assert(kept.length == 1)
      val expected = ids.map(i => (i, chars(i))).minBy { case (i, c) => (-c, i) }._1
      assert(kept.head.getAs[Long]("doc_id") == expected)
      ms.foreach(r => assert(r.getAs[Long]("keep_id") == expected))
    }
  }

  test("dsir: selects exactly the top-K by (logw, doc_id); no window in plan") {
    val df = Curation.curDsir(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val k = math.min(Curation.DsirKeep, rows.length)
    val sel = rows.filter(_.getAs[Long]("selected") == 1L)
    assert(sel.length == k)
    // sel_rank is a permutation of 1..k matching the (logw desc, id asc) order
    assert(sel.map(_.getAs[Long]("sel_rank")).sorted.toSeq == (1L to k).toSeq)
    val byRank = sel.sortBy(_.getAs[Long]("sel_rank"))
      .map(r => (r.getAs[Double]("logw"), r.getAs[Long]("doc_id")))
    assert(byRank.sameElements(byRank.sortBy { case (w, id) => (-w, id) }))
    // nothing unselected outranks the selection boundary
    val cut = byRank.last
    rows.filter(_.getAs[Long]("selected") == 0L).foreach { r =>
      val key = (-r.getAs[Double]("logw"), r.getAs[Long]("doc_id"))
      assert(key._1 > -cut._1 || (key._1 == -cut._1 && key._2 > cut._2))
    }
    // exemplar docs resemble the target distribution more than the rest
    val (t, o) = rows.partition(_.getAs[Long]("doc_id") % 10 == 0)
    def mean(a: Array[org.apache.spark.sql.Row]) =
      a.map(_.getAs[Double]("logw")).sum / a.length
    assert(mean(t) > mean(o), "target subset should carry higher importance weight")
    // bounded-heap selection, not a global window sort: no RANKING
    // window function anywhere in the plan. (A Window NODE is fine —
    // the r12 form computes the two 256-row distribution totals as an
    // unpartitioned window sum on the broadcast-destined bucket table;
    // what this guards against is ranking the corpus-sized scored
    // frame.)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number") && !plan.contains("dense_rank")
      && !plan.contains("windowspecdefinition(doc_id"),
      "dsir selection must use the bounded-heap top-k, not a window rank")
  }

  test("cur_split: leakage-safe, stable under corpus growth, near the cut fractions") {
    val df = Curation.curSplit(spark, sf)
    val rows = df.collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    // leakage safety: the bucket is a pure function of the TEXT (same
    // content ⇒ same split, so exact duplicates can never straddle
    // train/test) — pinned by refitting the bucket from md5(text) in
    // plain Scala per row (sf0.001 has no duplicate pair to observe
    // directly; content-keying is the property that protects them)
    def refBucket(text: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") == refBucket(texts(r.getAs[Long]("doc_id"))))
    }
    // stability: the assignment is a pure function of the row — the
    // same doc keeps its split when the rest of the corpus changes
    val half = Curation.curSplit(spark, sf).filter(col("doc_id") % 2 === 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.filter(_.getAs[Long]("doc_id") % 2 == 0).foreach { r =>
      assert(half(r.getAs[Long]("doc_id")) == r.getAs[String]("split"))
    }
    // cut fractions: hash-uniform buckets land near 80/10/10 (wide
    // tolerance — 500 docs with duplicate groups)
    val n = rows.length.toDouble
    val frac = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.25 && frac.getOrElse("test", 0.0) < 0.25, frac.toString)
    // buckets agree with the split labels
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val expect = if (b < Curation.SplitTrainPct) "train"
        else if (b < Curation.SplitTrainPct + Curation.SplitValPct) "val" else "test"
      assert(r.getAs[String]("split") == expect)
    }
  }

  test("cur_pipeline: stage attribution consistent with the component operators") {
    val rows = Curation.curPipeline(spark, sf).collect()
    val stage = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_stage")).toMap
    val gopher = Curation.curGopherRules(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep")).toMap
    val lang = operators.TextAnalysis.textLangid(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val stages = Set("eval_holdout", "gopher", "langid", "dedup", "decontaminated", "kept")
    assert(stage.values.forall(stages))
    assert(stage.values.exists(_ == "kept"))
    // per-doc funnel order agrees with each component's own verdict
    stage.foreach { case (id, st) =>
      if (id % 20 == 0) assert(st == "eval_holdout", s"doc $id")
      else if (gopher(id) == 0L) assert(st == "gopher", s"doc $id")
      else if (lang(id) != "en") assert(st == "langid", s"doc $id")
      else assert(Set("dedup", "decontaminated", "kept")(st), s"doc $id")
    }
    // a 'dedup' doc must have an earlier SURVIVING exact duplicate
    val preDedup = Set("dedup", "decontaminated", "kept")
    stage.filter(_._2 == "dedup").keys.foreach { id =>
      assert(stage.keys.exists(o => o < id && texts(o) == texts(id) && preDedup(stage(o))),
        s"doc $id marked dedup without an earlier surviving duplicate")
    }
    // a 'decontaminated' doc shares a word 5-gram with some holdout doc
    def g5(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val evalG = texts.collect { case (id, t) if id % 20 == 0 => g5(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    stage.filter(_._2 == "decontaminated").keys.foreach { id =>
      assert(g5(texts(id)).exists(evalG), s"doc $id marked decontaminated without overlap")
    }
    // and a 'kept' doc shares none
    stage.filter(_._2 == "kept").keys.foreach { id =>
      assert(!g5(texts(id)).exists(evalG), s"doc $id kept despite eval overlap")
    }
  }

  test("novelty audit: bounds, complement identity, hits match a direct recount") {
    val rows = Curation.curNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    // direct recount over the raw texts
    def g5(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainGrams = texts.collect { case (id, t) if id % 20 != 0 => g5(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 20 == 0, "non-eval doc in the audit")
      val grams = g5(texts(id))
      assert(r.getAs[Long]("n_grams") == grams.size)
      assert(r.getAs[Long]("n_hit") == grams.count(trainGrams))
      val hf = r.getAs[Double]("hit_frac")
      val nv = r.getAs[Double]("novelty")
      assert(hf >= 0.0 && hf <= 1.0 && nv >= 0.0 && nv <= 1.0)
      assert(math.abs(hf + nv - 1.0) < 2e-6, "hit_frac and novelty must complement")
      assert(r.getAs[Long]("memorized") == (if (hf >= 0.5) 1L else 0L))
    }
  }

  test("temperature pack: BFD refit exact, capacity respected, never worse than greedy") {
    val rows = Curation.curTemperaturePack(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("bin_fill")))
    assert(rows.nonEmpty)
    // input partition: exactly the temperature-mixed kept set, once each
    val kept = Curation.curTemperatureMix(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(rows.map(_._1).toSet == kept && rows.length == kept.size)
    val cap = Curation.PackWindow.toLong
    rows.groupBy(r => (r._2, r._3)).foreach { case ((src, sh), grp) =>
      // bin_fill consistent: sum of members, same value on every member
      val byBin = grp.groupBy(_._5)
      byBin.foreach { case (bin, members) =>
        val fill = members.map(_._4).sum
        assert(members.forall(_._6 == fill), s"($src,$sh) bin $bin fill mismatch")
        // capacity respected unless the bin is a single oversize doc
        assert(fill <= cap || members.length == 1,
          s"($src,$sh) bin $bin overfilled with ${members.length} docs")
      }
      // bin ids dense from 0
      assert(byBin.keys.toSeq.sorted == (0L until byBin.size.toLong),
        s"($src,$sh) bin ids not dense")
      // plain-Scala BFD refit reproduces the exact placement
      val sorted = grp.map(r => (r._1, r._4)).sortBy { case (id, n) => (-n, id) }
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      val refit = sorted.map { case (id, n) =>
        val fits = loads.zipWithIndex.filter { case (l, _) => l + n <= cap }
        val bin =
          if (fits.isEmpty) { loads += n; loads.length - 1 }
          else {
            val b = fits.maxBy { case (l, i) => (l, -i) }._2
            loads(b) += n; b
          }
        id -> bin.toLong
      }.toMap
      grp.foreach { case (id, _, _, _, bin, _) =>
        assert(refit(id) == bin, s"doc $id: engine bin $bin != refit ${refit(id)}")
      }
      // BFD never uses more bins than the greedy next-fit baseline
      // (place in doc_id order, open a new bin when the current one
      // is full — the packing a naive pipeline ships)
      var nfBins = 0
      var cur = -1L
      grp.sortBy(_._1).foreach { case (_, _, _, n, _, _) =>
        if (cur < 0 || cur + n > cap) { nfBins += 1; cur = n }
        else cur += n
      }
      assert(byBin.size <= nfBins,
        s"($src,$sh) BFD ${byBin.size} bins > next-fit $nfBins")
    }
  }
}
