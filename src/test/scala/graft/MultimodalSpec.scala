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
}
