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
}
