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

  test("prefix-filter pair set equals an independent brute-force jaccard sweep") {
    // completeness is the whole point of prefix filtering: on a
    // generated corpus dense with near-dups (mutated copies of a few
    // base texts over a tiny vocabulary — lots of boundary-jaccard
    // pairs), the engine's prefix-filtered output must equal a pure-
    // Scala all-pairs recomputation with the same shingle + rounding
    // semantics. A missed prefix candidate shows up here as a missing
    // pair.
    val r = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def baseText() =
      Vector.fill(12 + r.nextInt(8))(vocab(r.nextInt(vocab.size))).mkString(" ")
    val bases = Vector.fill(8)(baseText())
    val texts = (0 until 40).map { _ =>
      val b = bases(r.nextInt(bases.size)).split(" ").toVector
      val m =
        if (r.nextBoolean()) b.updated(r.nextInt(b.size), vocab(r.nextInt(vocab.size)))
        else b
      m.mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ppjoin").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.dedupPrefixFilter(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sh = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }.toMap
    val want = (for {
      a <- sh.keys
      b <- sh.keys
      if a < b
      inter = (sh(a) & sh(b)).size
      if inter > 0
      j = BigDecimal(inter.toDouble / (sh(a).size + sh(b).size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= graft.operators.Dedup.PrefixFilterBar
    } yield (a, b)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("adversarial hot-shingle skew: DfCap bounds fan-out, result stays exact") {
    import graft.operators.Dedup
    // One pathological boilerplate shingle shared by EVERY document —
    // df = 2222 ≈ 111x DfCap (the hot-key skew a crawl's site-chrome
    // produces at 100 TB). Without the cap the inverted-index
    // self-join would emit ~2.5M candidate pairs from that key alone;
    // with it, candidates come only from the planted sub-cap
    // shingles, and the hot shingle still counts toward each pair's
    // EXACT intersection through the hot-path arrays.
    val hot = "HOT HOT HOT"
    val fillers = (0 until 2178).map(i =>
      (i.toLong, (hot.split(" ").toVector ++ (0 until 9).map(k => s"u${i}_$k")).mkString(" ")))
    // 22 planted near-dup pairs: b = a with the LAST token changed →
    // 9 of 10 shingles shared, jaccard 9/11 ≈ 0.8182 ≥ the 0.5 bar
    val planted = (0 until 22).flatMap { k =>
      val a = 3000L + 2 * k
      val toksA = hot.split(" ").toVector ++ (0 until 9).map(j => s"p${k}_$j")
      val toksB = toksA.updated(toksA.size - 1, s"q$k")
      Seq((a, toksA.mkString(" ")), (a + 1, toksB.mkString(" ")))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    (fillers ++ planted)
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // structural bound: the capped index (the self-join's input) holds
    // NO key above DfCap — per-key fan-out ≤ DfCap² regardless of the
    // hot key's frequency — and the hot shingle itself is absent
    val capped = Dedup.cappedIndex(Dedup.shingledEx(spark, dir))
    val maxDf = capped.groupBy(col("s")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxDf <= Dedup.DfCap, s"capped index leaked a df=$maxDf key")
    assert(capped.filter(col("s") === hot).isEmpty, "hot shingle reached the join input")
    // exactness: precisely the planted pairs, with the hot shingle
    // included in every intersection (filler pairs share ONLY the hot
    // shingle → jaccard 1/19 < 0.5, provably excluded)
    val got = Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val j = BigDecimal(9.0 / 11.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (0 until 22).map(k => (3000L + 2 * k, 3000L + 2 * k + 1, j)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("shard shuffle is a permutation: every doc exactly once, positions dense per shard") {
    import graft.operators.Curation
    val got = Curation.curShardShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = sources.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // bijection: every input doc appears exactly once
    assert(got.map(_._1).toSet == docs)
    assert(got.length == docs.size)
    // per shard, positions are exactly 1..|shard| (dense, no gaps)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // the hash spreads: no shard holds more than 3x its fair share
    val fair = docs.size.toDouble / Curation.NumShards
    got.groupBy(_._2).values.foreach(rows =>
      assert(rows.length <= 3 * fair, s"skewed shard: ${rows.length} vs fair $fair"))
  }

  test("multi-index Hamming candidates are complete for the distance bar") {
    import graft.operators.Multimodal
    // brute-force ALL pairs' signature Hamming distances and assert
    // the banded operator returns exactly the <= bar set — the
    // pigeonhole completeness argument, checked end-to-end on a
    // corpus dense in small perturbations
    val r = new scala.util.Random(11)
    val base = (0 until 30).map(_ => 32 + r.nextInt(90)).map(_.toChar).mkString
    val texts = (0 until 60).map { i =>
      if (i % 3 == 0) base
      else base.updated(r.nextInt(base.length), (32 + r.nextInt(90)).toChar)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-mih").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Multimodal.mmHammingNeardup(spark, dir).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2))).toSet
    // reference signatures computed the same way, brute-forced
    def sig(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val counts = new Array[Int](Multimodal.SimhashBits)
      var i = 0
      while (i + 2 < bytes.length) {
        md.reset(); md.update(bytes, i, 3)
        val dig = md.digest()
        var h = 0L
        (0 until 6).foreach(j => h = (h << 8) | (dig(j) & 0xffL))
        (0 until Multimodal.SimhashBits).foreach(b =>
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
        i += 1
      }
      (0 until Multimodal.SimhashBits).foldLeft(0L)((acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val sigs = texts.map(sig)
    val want = (for {
      a <- texts.indices; b <- texts.indices if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if h <= Multimodal.HammingBar
    } yield (a.toLong, b.toLong, h.toLong)).toSet
    assert(want.nonEmpty, "test corpus produced no near pairs — tighten the perturbation")
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
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

  private def writeDocs(prefix: String, docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force keep-first substring-span recomputation at width k —
    * the same model as TextCurationSpec's pin, shared by the hot-key
    * and paper-width corpora below. */
  private def substrBrute(docs: Seq[(Long, Array[String])], k: Int)
  : Seq[(Long, Long, Long, Long, Double, String)] = {
    val seen = scala.collection.mutable.HashSet[String]()
    val dupIv = scala.collection.mutable.HashMap[Long, List[(Int, Int)]]()
    for ((id, toks) <- docs.sortBy(_._1); p <- 1 to toks.length - k + 1) {
      val g = toks.slice(p - 1, p - 1 + k).mkString(" ")
      if (!seen.add(g)) dupIv(id) = (p, p + k - 1) :: dupIv.getOrElse(id, Nil)
    }
    docs.sortBy(_._1).map { case (id, toks) =>
      val merged = dupIv.getOrElse(id, Nil).sortBy(_._1)
        .foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, (a, b)) if a <= e0 + 1 => (s0, math.max(e0, b)) :: rest
          case (acc, iv) => iv :: acc
        }.reverse
      val covered = merged.flatMap { case (a, b) => a to b }.toSet
      val kept = toks.zipWithIndex.collect { case (t, i) if !covered(i + 1) => t }
      val dupToks = merged.map { case (a, b) => b - a + 1 }.sum
      (id, toks.length.toLong, merged.length.toLong, dupToks.toLong,
        round6(dupToks.toDouble / toks.length),
        if (kept.isEmpty) null else md5hex(kept.mkString(" ")))
    }
  }

  test("adversarial hot-block skew: keep-first dedup stays exact with one block in 40% of docs") {
    import graft.operators.Dedup
    // The WindowExec hazard corpus: ONE boilerplate block (8 tokens =
    // ParaBlockTokens, so it is also a run of hot SubstrK-windows)
    // planted in 40% of 500 docs — the site-chrome skew a crawl
    // produces, where a row_number() window over block content would
    // funnel 200 occurrences into one task. The argmax rewrite must
    // keep the RESULT byte-identical to the keep-first model under
    // exactly this skew.
    val hot = (1 to graft.operators.Dedup.ParaBlockTokens).map(i => s"hot$i").mkString(" ")
    val docs = (0 until 500).map { i =>
      val uniq1 = (0 until 8).map(j => s"d${i}_a$j").mkString(" ")
      val uniq2 = (0 until 8).map(j => s"d${i}_b$j").mkString(" ")
      val text = if (i % 5 < 2) s"$uniq1 $hot $uniq2" else s"$uniq1 $uniq2"
      (i.toLong, text)
    }
    val dir = writeDocs("graft-hotblock", docs)
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    // dedup_paragraph: brute-force keep-first over 8-token blocks
    val b = Dedup.ParaBlockTokens
    val seen = scala.collection.mutable.HashSet[String]()
    val wantPara = toks.sortBy(_._1).map { case (id, tk) =>
      val blocks = tk.grouped(b).map(_.mkString(" ")).toVector
      val first = blocks.map(seen.add)
      val kept = blocks.zip(first).collect { case (bl, true) => bl }
      val nDup = first.count(!_)
      (id, blocks.size.toLong, nDup.toLong, round6(nDup.toDouble / blocks.size),
        if (kept.isEmpty) null else md5hex(kept.mkString(" ")))
    }
    val gotPara = Dedup.dedupParagraph(spark, dir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_blocks"), r.getAs[Long]("n_dup_blocks"),
        r.getAs[Double]("dup_frac"), r.getAs[String]("kept_md5")))
    assert(gotPara.length == wantPara.length)
    gotPara.zip(wantPara).foreach { case (g, e) => assert(g == e, s"para: got $g want $e") }
    // the hot block really is hot: 200 docs carry it, 199 are marked
    assert(wantPara.count(_._3 > 0) == 199)
    // dedup_substring under the same skew (the hot block is 5
    // consecutive hot windows at SubstrK=4)
    val gotSub = Dedup.dedupSubstring(spark, dir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac"), r.getAs[String]("clean_md5")))
    val wantSub = substrBrute(toks, Dedup.SubstrK)
    assert(gotSub.length == wantSub.length)
    gotSub.zip(wantSub).foreach { case (g, e) => assert(g == e, s"substr: got $g want $e") }
  }

  test("substring dedup at the paper's k=50: planted >=50-token spans, brute-force equality") {
    import graft.operators.Dedup
    val k = 50
    val r = new scala.util.Random(11)
    def uniq(tag: String, n: Int) = (0 until n).map(j => s"${tag}_$j")
    // two plantable spans, both ≥ k tokens
    val spanA = (0 until 60).map(j => s"sa$j")
    val spanB = (0 until 55).map(j => s"sb$j")
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    // doc 0/1: spanA at different offsets → doc 0 keeps it, doc 1 is
    // partially covered
    docs += 0L -> (uniq("d0", 20) ++ spanA ++ uniq("d0t", 20)).mkString(" ")
    docs += 1L -> (uniq("d1", 5) ++ spanA ++ uniq("d1t", 30)).mkString(" ")
    // doc 2: first carrier of spanB (keeps it)
    docs += 2L -> (uniq("d2", 12) ++ spanB ++ uniq("d2t", 12)).mkString(" ")
    // doc 3: BOTH spans with a >1-token gap between them → two dup
    // islands after the merge (multi-span doc)
    docs += 3L -> (spanA ++ uniq("d3", 10) ++ spanB ++ uniq("d3t", 3)).mkString(" ")
    // doc 4: byte-exact copy of doc 0 → whole-doc coverage, NULL md5
    docs += 4L -> docs(0)._2
    // noise: 40 unique docs of ~60 tokens, never duplicated
    (5 until 45).foreach { i =>
      docs += i.toLong -> uniq(s"n$i", 55 + r.nextInt(10)).mkString(" ")
    }
    val dir = writeDocs("graft-substr50", docs.toSeq)
    val toks = docs.toSeq.map { case (id, t) => id -> t.split(" ", -1) }
    val want = substrBrute(toks, k)
    val got = Dedup.dedupSubstringAt(spark, dir, k).collect().map(r2 =>
      (r2.getAs[Long]("doc_id"), r2.getAs[Long]("n_tokens"), r2.getAs[Long]("n_dup_spans"),
        r2.getAs[Long]("dup_tokens"), r2.getAs[Double]("dup_frac"), r2.getAs[String]("clean_md5")))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) => assert(g == e, s"k=50: got $g want $e") }
    // non-vacuity at the paper width: a multi-span doc, a partially
    // covered doc, and a fully-duplicated doc all exist
    assert(want.count(_._3 > 1) > 0, "no multi-span doc")
    assert(want.count(e => e._4 > 0 && e._4 < e._2) > 0, "no partially-covered doc")
    assert(want.count(_._6 == null) > 0, "no fully-duplicated doc")
  }

  test("judge envelope parser: total on arbitrary input (parse or error, never a throw)") {
    import graft.operators.Etl
    val fragGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("{", "}", "[", "]", "\"", ":", ",", "null", "true", "0.5",
        """{"completion":""", """{"content":[{"text":"x"}]}""",
        """{"choices":[{}]}""", """{"labels":""", "\\", "\n"),
      Gen.listOfN(3, Gen.asciiPrintableChar).map(_.mkString))
    val rawGen = Gen.listOf(fragGen).map(_.mkString(" "))
    samples(rawGen, 400).foreach { raw =>
      // total: one of (parsed, null) / (null, error) — and no exception
      val (parsed, err) = Etl.parseJudgeOutput(raw)
      assert((parsed != null) != (err != null),
        s"exactly one of parse/error expected for <$raw>")
      // the quality ladder is total over whatever parsed
      if (parsed != null) {
        val c = Etl.qualityColorOf(
          if (parsed.isObject) parsed.get("labels") else null)
        assert(Set("RED", "YELLOW", "GREEN", "GRAY")(c))
      }
    }
    // null/empty explicitly
    assert(Etl.parseJudgeOutput("")._2 == "empty judge response")
    assert(Etl.parseJudgeOutput(null)._2 == "empty judge response")
  }

  test("quantile sketch: exact at capacity >= n; compaction bounds rank error; merge invariant") {
    import graft.functions.QuantileSketch
    import spark.implicits._
    val r = new scala.util.Random(42)
    val n = 4096
    val values = Array.fill(n)(r.nextDouble() * 1000.0)
    val sorted = values.sorted
    val probes = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    def run(capacity: Int): Array[Double] =
      values.toSeq.toDF("v")
        .agg(QuantileSketch.quantileSketch(col("v"), capacity, probes).as("q"))
        .collect().head.getSeq[Double](0).toArray
    // exact regime: capacity >= n -> precisely the order statistic
    val exact = run(n + 1)
    probes.zip(exact).foreach { case (p, est) =>
      val target = math.max(1L, math.ceil(p * n).toLong).toInt
      assert(est == sorted(target - 1), s"p=$p: exact regime diverged")
    }
    // compacting regime: small capacity forces multi-level compaction;
    // the deterministic variant's rank error is bounded by
    // ~levels * n / capacity (each level-i compaction perturbs ranks
    // by <= 2^i, and there are ~n/(c*2^i) of them per level)
    val c = 64
    val approx = run(c)
    val levels = (math.log((2.0 * n) / c) / math.log(2.0)).ceil
    val bound = (levels * n / c).toLong
    probes.zip(approx).foreach { case (p, est) =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val rank = sorted.count(_ <= est).toLong
      assert(math.abs(rank - target) <= bound,
        s"p=$p: rank error ${math.abs(rank - target)} > bound $bound")
    }
    // distribution across partitions (merge path) stays in the exact
    // regime's answer when capacity holds everything
    val merged = values.toSeq.toDF("v").repartition(8)
      .agg(QuantileSketch.quantileSketch(col("v"), n + 1, probes).as("q"))
      .collect().head.getSeq[Double](0).toArray
    assert(merged.toSeq == exact.toSeq, "merge of exact partials must stay exact")
  }

  test("128-bit window key distinguishes an engineered 64-bit collision") {
    import graft.operators.{Dedup, TextAnalysis}
    val B = Dedup.RollB
    // The rolling hash is linear in the token hashes, so a collision
    // is CONSTRUCTIBLE: the width-2 windows [x, y] and [x+1, y-B]
    // roll to the same 64-bit value (xB + y = (x+1)B + (y-B)). This
    // is the class of merge the single-channel key of rounds <=10
    // could not see.
    val x = 0x123456789abcdef0L
    val y = 0x0fedcba987654321L
    val primA = Array(x, y)
    val primB = Array(x + 1, y - B)
    assert(primA.toSeq != primB.toSeq)
    assert(Dedup.rollWindows(primA, 2)(0) == Dedup.rollWindows(primB, 2)(0),
      "engineered primary-channel collision must collide (it is the premise)")
    // In the dual-key kernel each window carries a SECOND channel
    // rolled over the independently-seeded (TokenSalt) token hashes.
    // For any real token pair realizing primA/primB, the salted
    // hashes are independent values — model them with the actual
    // salted hashes of distinct tokens: the pair key differs even
    // though the primary channel collided.
    val saltA = Array(
      TextAnalysis.tokenHashPairs("alpha", 1)._2(0),
      TextAnalysis.tokenHashPairs("beta", 1)._2(0))
    val saltB = Array(
      TextAnalysis.tokenHashPairs("gamma", 1)._2(0),
      TextAnalysis.tokenHashPairs("delta", 1)._2(0))
    val keyA = (Dedup.rollWindows(primA, 2)(0), Dedup.rollWindows(saltA, 2)(0))
    val keyB = (Dedup.rollWindows(primB, 2)(0), Dedup.rollWindows(saltB, 2)(0))
    assert(keyA != keyB, "the 128-bit pair key must distinguish the engineered collision")
    // and the salted channel is genuinely independent of the primary:
    // same tokens, different seeds, different values
    val (p, s2) = TextAnalysis.tokenHashPairs("alpha beta gamma", 1)
    assert(p.toSeq != s2.toSeq)
    // tokenHashPairs' primary channel stays byte-identical to the
    // legacy single-channel path (oracle continuity)
    assert(p.toSeq == TextAnalysis.tokenHashes("alpha beta gamma", 1).toSeq)
  }

  test("quantile sketch: odd-length compaction conserves total weight (merge path)") {
    import graft.functions.QuantileSketch
    import spark.implicits._
    // mergeIn/deserialize can leave an ODD-length level; the r12
    // compaction retains the leftover item at its level (standard
    // KLL) instead of dropping its 2^i weight. Conservation is
    // observable end-to-end: with every value identical, every
    // quantile must return that value and the sketch must never go
    // empty/NaN — and with capacity 2 (the minimum) the compaction
    // cascade fires maximally, so any dropped weight would surface as
    // an all-NaN output on small n.
    val probes = Seq(0.01, 0.5, 1.0)
    val out = Seq.fill(63)(7.5).toDF("v").repartition(7)
      .agg(QuantileSketch.quantileSketch(col("v"), 2, probes).as("q"))
      .collect().head.getSeq[Double](0)
    assert(out.forall(_ == 7.5), s"weight lost through odd compaction: $out")
    // rank accuracy with distinct values under the same max-cascade
    // regime: the retained-leftover variant keeps the median within
    // the documented levels*n/c bound where the dropping variant's
    // bias compounds per level
    val n = 1024
    val vals = (1 to n).map(_.toDouble)
    val med = vals.toDF("v").repartition(8)
      .agg(QuantileSketch.quantileSketch(col("v"), 64, Seq(0.5)).as("q"))
      .collect().head.getSeq[Double](0).head
    val levels = (math.log((2.0 * n) / 64) / math.log(2.0)).ceil
    assert(math.abs(med - n / 2.0) <= levels * n / 64,
      s"median rank drifted: $med")
  }

  test("paragraph block hashes: block-length seed prevents prefix aliasing") {
    import graft.operators.Dedup
    // A document whose LAST (short) block is a strict prefix of
    // another document's full block must not merge with it: the
    // rolling combine alone would alias [h] and [h] (trivially equal)
    // but also [x] vs [0, x]-style constructions; seeding each
    // channel with the block length makes the (value, length) pair
    // part of the key. Exercise through the public operator: two
    // docs, one 9 tokens (blocks: 8 + 1-token "i"), one whose FIRST
    // block is the single token "i" padded differently (1-token doc).
    // The 1-token block of doc A ("i") and the 1-token doc B ("i")
    // SHOULD merge (same content, same length); a doc whose 8-token
    // block STARTS with "i" must not.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("parablk").toString
    Seq(
      (0L, "a b c d e f g h i", "src", 17L),
      (1L, "i", "src", 1L),
      (2L, "i j k l m n o p", "src", 15L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.paraBlockHashes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val key = rows.map { case (d, i, h1, h2) => ((d, i), (h1, h2)) }.toMap
    // doc0 block2 = ["i"] must equal doc1 block1 = ["i"]
    assert(key((0L, 2)) == key((1L, 1)), "identical 1-token blocks must share a key")
    // ...and must NOT equal doc2 block1 = ["i","j",...] (8 tokens
    // starting with the same token) — the length seed separates them
    assert(key((0L, 2)) != key((2L, 1)), "short block aliased a longer one")
  }

  test("hll48Kernel is bit-identical to the conv(substring(md5)) expression form") {
    import graft.operators.Relational
    // The r15 typed kernel replaced the five-string-op Column
    // expression in q47/q49; the DuckDB oracle still evaluates the
    // expression form, so the claim under the gate is exact
    // (h, idx, rho) equality for EVERY key — pin it directly on
    // adversarial longs, not just the corpus keys (negatives hash
    // their '-'-prefixed decimal rendering). The w == 0 branch is
    // unreachable by construction here (no key's md5 has 40 zero
    // suffix bits); both forms guard it identically by code.
    val keys = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 40) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L, -42L)
    val in = keys.toDF("k")
    val W = 40
    val expr = in
      .select(conv(substring(md5(col("k").cast("string")), 1, 12), 16, 10)
        .cast("long").as("h"))
      .select(col("h"), shiftrightunsigned(col("h"), W).cast("int").as("idx"),
        col("h").bitwiseAND(lit((1L << W) - 1)).as("w"))
      .select(col("h"), col("idx"),
        when(col("w") === 0, lit(W + 1))
          .otherwise(lit(W + 1) - length(conv(col("w"), 10, 2)))
          .cast("int").as("rho"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val kern = Relational.hll48Kernel(spark, in)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(kern.toSeq == expr.toSeq)
    // and the advertised ranges hold: idx in [0, 256), rho in [1, 41]
    kern.foreach { case (_, idx, rho) =>
      assert(idx >= 0 && idx < 256 && rho >= 1 && rho <= 41)
    }
  }

  test("pqAssignCell fused kernel matches the centroidSims expression cell and pqAssign codes") {
    import graft.operators.Similarity
    // The r15 fused serving kernel computes the coarse cell inside the
    // PQ-encode pass; the IVFPQ gate rows depend on it matching the
    // array_max(centroidSims) expression BIT-FOR-BIT (same sequential
    // dot accumulation, same division order, ties to the smaller
    // cell). Pin cell+code equality per (vec_id, m) on the real
    // sf0.001 corpus through both paths.
    val d = "/root/testdata/sf0.001"
    val cents = Similarity.kmeansCentroids(spark, d)
    val books = Similarity.pqCodebooks(spark, d)
    val e = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        org.apache.spark.sql.functions.expr(
          "transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.DotProduct.dot(col("v"), col("v"))))
    val exprCell = e
      .withColumn("sims", Similarity.centroidSimsForTest(cents))
      .select(col("vec_id"),
        (-array_max(col("sims")).getField("negcell")).cast("int").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fused = Similarity.pqAssignCell(spark,
        e.select(col("vec_id"), col("label"), col("v")), books, cents)
      .collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      assert(r.getInt(2) == exprCell(r.getLong(0)),
        s"cell mismatch for vec ${r.getLong(0)}")
    }
    val oldCodes = Similarity.pqAssignForTest(spark, d, books)
      .select(col("vec_id"), col("m"), col("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    fused.foreach { r =>
      assert(r.getInt(4) == oldCodes((r.getLong(0), r.getInt(3))),
        s"code mismatch for vec ${r.getLong(0)} m ${r.getInt(3)}")
    }
  }
}
