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
}
