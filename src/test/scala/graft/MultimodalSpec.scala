package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stub decoder is deterministic and normalized") {
    val blob = "hello multimodal world".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(blob)
    val f2 = Multimodal.stubDecode(blob)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.FeatureBins)
    assert(math.abs(f1.sum - 1.0) < 1e-9)
  }

  test("empty blob yields zero features, no NaN") {
    val f = Multimodal.stubDecode(Array.emptyByteArray)
    assert(f.forall(x => !x.isNaN && x == 0.0))
  }

  test("shot boundary: equals a brute-force recompute; bounds hold") {
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").getBytes("UTF-8"))
    val expected = docs.flatMap { case (id, blob) =>
      val fs = Multimodal.FrameSize
      val nf = math.min(blob.length / fs, Multimodal.ShotMaxFrames)
      val hists = Array.tabulate(nf) { f =>
        val h = new Array[Long](Multimodal.FeatureBins)
        (0 until fs).foreach(i => h((blob(f * fs + i) & 0xff) % Multimodal.FeatureBins) += 1L)
        h
      }
      (1 until nf).flatMap { f =>
        val l1 = (0 until Multimodal.FeatureBins)
          .map(b => math.abs(hists(f)(b) - hists(f - 1)(b))).sum
        if (l1 > Multimodal.ShotBar) Some((id, f.toLong, l1)) else None
      }
    }.toSet
    val got = Multimodal.mmShotBoundary(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"), r.getAs[Long]("l1_dist")))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty, "corpus should contain shot boundaries")
    // L1 of two equal-length frame histograms is bounded by 2*FrameSize
    got.foreach { case (_, fi, l1) =>
      assert(fi >= 1 && l1 > Multimodal.ShotBar && l1 <= 2L * Multimodal.FrameSize)
    }
  }

  test("feature extract pipeline: one row per document, f_sum ~ 1") {
    val df = Multimodal.mmFeatureExtract(spark, sf)
    val rows = df.collect()
    assert(rows.length == sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("f_sum") - 1.0) < 1e-3)
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("metadata kinds partition the corpus") {
    val df = Multimodal.mmMetadata(spark, sf)
    assert(df.count() == sources.Tables.documents(spark, sf).count())
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("key-doc", "the-doc", "other")))
  }

  test("media dedup: signatures match the stub histogram rule, exact groups correct") {
    val texts = sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Multimodal.mmDedup(spark, sf).collect()
    assert(rows.length == texts.size)
    // the column-expression signature equals the kernel-side rule
    def sigOf(t: String): Long = {
      val bytes = t.getBytes("UTF-8")
      val counts = new Array[Int](Multimodal.FeatureBins)
      bytes.foreach(b => counts((b & 0xff) % Multimodal.FeatureBins) += 1)
      counts.zipWithIndex.map { case (c, i) =>
        if (c.toLong * Multimodal.FeatureBins > bytes.length) 1L << i else 0L
      }.sum
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("sig") == sigOf(texts(id)), s"doc $id")
      assert(r.getAs[Long]("n_bytes") == texts(id).length.toLong)
    }
    // exact groups: keep_id is the min doc of each identical-blob group
    val byText = texts.toSeq.groupBy(_._2)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val group = byText(texts(id)).map(_._1)
      assert(r.getAs[Long]("n_copies") == group.length.toLong)
      assert(r.getAs[Long]("keep_id") == group.min)
      assert((r.getAs[Long]("exact_keep") == 1L) == (id == group.min))
    }
    // perceptual buckets are a coarsening of exact identity: identical
    // blobs always share a signature, so mates >= copies — and the
    // 16-bit space must actually group somebody at this corpus size
    rows.foreach(r =>
      assert(r.getAs[Long]("n_sig_mates") >= r.getAs[Long]("n_copies")))
    assert(rows.exists(_.getAs[Long]("n_sig_mates") > 1), "no perceptual grouping happened")
    rows.groupBy(_.getAs[Long]("sig")).foreach { case (_, rs) =>
      rs.foreach(r => assert(r.getAs[Long]("n_sig_mates") == rs.length.toLong))
    }
  }

  test("hamming geometry derives from the corpus count and stays pigeonhole-complete") {
    import Multimodal.{hammingGeometry, bandValues, HammingGeometry}
    // regime selection: occupancy cap 16 per 2^12 bucket → flip at 65 536
    assert(hammingGeometry(500) == HammingGeometry(4, 12, 3, wide = false))
    assert(hammingGeometry(65536) == HammingGeometry(4, 12, 3, wide = false))
    assert(hammingGeometry(65537) == HammingGeometry(8, 16, 7, wide = true))
    assert(hammingGeometry(300000000L) == HammingGeometry(8, 16, 7, wide = true))
    // both geometries: bands partition the signature bits, bar = bands − 1
    for (g <- Seq(hammingGeometry(500), hammingGeometry(1000000))) {
      assert(g.bar == g.bands - 1)
      assert(g.bands * g.bandBits == (if (g.wide) 128 else Multimodal.SimhashBits))
    }
    // pigeonhole completeness: flip ≤ bar bits of a random signature —
    // the pair MUST still share at least one band value, in both regimes
    val rnd = new scala.util.Random(20260814)
    for (g <- Seq(hammingGeometry(500), hammingGeometry(1000000)); _ <- 1 to 2000) {
      val sigBits = g.bands * g.bandBits
      val hi = if (g.wide) rnd.nextLong() else 0L
      val lo = if (g.wide) rnd.nextLong()
        else rnd.nextLong() & ((1L << Multimodal.SimhashBits) - 1)
      var (h2, l2) = (hi, lo)
      val nFlips = rnd.nextInt(g.bar + 1)
      (1 to nFlips).foreach { _ =>
        val b = rnd.nextInt(sigBits)
        if (b < 64) l2 ^= (1L << b) else h2 ^= (1L << (b - 64))
      }
      val shared = bandValues(hi, lo, g).zip(bandValues(h2, l2, g)).exists(p => p._1 == p._2)
      assert(shared, s"pair at distance <= ${g.bar} lost all bands under $g")
    }
  }

  test("wide-geometry hamming output equals an independent brute-force recomputation") {
    // End-to-end correctness pin for the WIDE 8x16 regime (the test
    // SFs always select narrow, so the DuckDB gate never exercises
    // this path): recompute every 128-bit trigram simhash and ALL
    // all-pairs Hamming distances in plain Scala from the raw texts,
    // and require the engine's banded candidate generation + verify
    // to emit exactly the pairs at distance <= 7. This also re-proves
    // pigeonhole completeness on real data: banding may only PRUNE
    // safe pairs, never lose one under the bar.
    val g = Multimodal.hammingGeometry(100000)
    assert(g.wide)
    val texts = sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def sigOf(t: String): (Long, Long) = {
      val blob = t.getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](128)
      var i = 0
      while (i + 2 < blob.length) {
        md.reset(); md.update(blob, i, 3)
        val dig = md.digest()
        var hHi = 0L; var hLo = 0L
        var j = 0
        while (j < 8) { hHi = (hHi << 8) | (dig(j) & 0xffL); j += 1 }
        while (j < 16) { hLo = (hLo << 8) | (dig(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((hLo >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((hHi >> b) & 1L) == 1L) counts(64 + b) += 1 else counts(64 + b) -= 1
          b += 1
        }
        i += 1
      }
      var lo = 0L; var hi = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) lo |= (1L << b); b += 1 }
      while (b < 128) { if (counts(b) > 0) hi |= (1L << (b - 64)); b += 1 }
      (hi, lo)
    }
    val sigs = texts.filter(_._2.getBytes("UTF-8").length >= 3)
      .map { case (id, t) => id -> sigOf(t) }
    val expected = (for {
      (a, (ha, la)) <- sigs; (b, (hb, lb)) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= g.bar
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.mmHammingNeardupAt(spark, sf, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"wide regime diverged: ${(expected -- got).take(3)} missing, ${(got -- expected).take(3)} extra")
    assert(expected.nonEmpty, "brute force found no wide-regime pairs — vacuous test")
  }

  test("wide-geometry hamming pairs are a superset of narrow pairs at the narrow bar") {
    import org.apache.spark.sql.functions.col
    val narrow = Multimodal.mmHammingNeardupAt(spark, sf,
      Multimodal.hammingGeometry(500))
    val wideG = Multimodal.hammingGeometry(100000)
    val wide = Multimodal.mmHammingNeardupAt(spark, sf, wideG)
    assert(wideG.wide)
    val widePairs = wide.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrowRows = narrow.collect()
    // every narrow signature distance is a projection of the wide one:
    // wide distance >= narrow distance, and a wide pair at distance <=
    // 3 on the 48 shared-construction bits need not survive — but the
    // wide run must still FIND pairs (its bar is higher) and both runs
    // must be reflexively consistent (doc_a < doc_b, bounded hamming)
    narrowRows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= 3L)
    }
    wide.collect().foreach(r => assert(r.getLong(2) <= wideG.bar.toLong))
    assert(widePairs.nonEmpty, "wide geometry found no pairs on the test corpus")
  }
}
