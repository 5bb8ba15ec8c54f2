package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** §2.4 embedding similarity + §2.3's embedding near-dup.
  *
  * Dot products / norms are sequential left-to-right double sums
  * (`aggregate` over `zip_with`), mirrored exactly by `list_reduce`
  * in the DuckDB oracles so float results are bit-identical and the
  * rounded-threshold filters agree.
  *
  * Scale posture: the brute-force pair scan is the correctness
  * baseline (and is still shuffle-free: small side broadcast). The
  * scale path is the hyperplane-LSH variant, whose candidate set is a
  * bucket-equality join.
  */
object Similarity {

  val CosineThreshold = 0.4
  val TopK = 5
  val NumQueryVecs = 10
  val NumPlanes = 12

  import graft.functions.DotProduct.dot

  /** embeddings with double-cast vector and L2 norm (norm computed
    * once per vector, not per candidate pair).
    */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Codegen'd [[graft.functions.DotProduct]]: sequential accumulation,
    * bit-compatible with `aggregate(zip_with(...))` and the DuckDB
    * `list_reduce` oracle, but allocation-free per pair.
    */
  private def pairDot = dot(col("va"), col("vb"))

  /** Embedding near-dup pairs: cosine ≥ τ on the rounded value. */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(s, d)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("nrma"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nrmb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(pairDot / col("nrma") / col("nrmb"), 4))
      .filter(col("cosine") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Exact cosine top-k per query vector (queries = vec_id < 10),
    * query side broadcast, rank deterministic on (rounded cosine desc,
    * neighbor id asc).
    */
  def annBruteforceTopk(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(s, d)
    val q = e.filter(col("vec_id") < NumQueryVecs)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("nrma"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(pairDot / col("nrma") / col("nrmb"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH ANN: 12 deterministic pseudo-random
    * hyperplanes → 12-bit sign bucket per vector; candidates share a
    * bucket; top-k within the candidate set. Approximate (probabilistic
    * recall) ⇒ rows-only driver check; recall is asserted in
    * SimilaritySpec against the brute-force baseline.
    */
  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val rng = new scala.util.Random(42)
    val planes: Seq[Seq[Double]] =
      Seq.fill(NumPlanes)(Seq.fill(64)(rng.nextGaussian()))
    val e = withNorm(s, d)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(expr(s"aggregate(zip_with(v, array(${p.mkString(",")}), (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)") >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val eb = e.withColumn("bucket", bucket)
    val q = eb.filter(col("vec_id") < NumQueryVecs)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("nrma"), col("bucket").as("qb"))
    val n = eb.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("nrm").as("nrmb"), col("bucket").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(n, col("qb") === col("nb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(pairDot / col("nrma") / col("nrmb"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding_cosine" -> dedupEmbeddingCosine _,
    "ann_bruteforce_topk" -> annBruteforceTopk _,
    "ann_lsh_topk" -> annLshTopk _)

  private val cosineCte =
    """WITH n AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (acc, x) -> acc + x)) AS nrm
      | FROM embeddings)""".stripMargin

  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       | list_transform(generate_series(1, 64), i -> $a.v[i] * $b.v[i])),
       | (acc, x) -> acc + x)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_embedding_cosine" ->
      s"""$cosineCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | round(${dotSql("a", "b")} / a.nrm / b.nrm, 4) AS cosine
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE round(${dotSql("a", "b")} / a.nrm / b.nrm, 4) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,
    "ann_bruteforce_topk" ->
      s"""$cosineCte,
         |c AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |  round(${dotSql("a", "b")} / a.nrm / b.nrm, 4) AS cosine
         | FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
         |r AS (SELECT query_id, neighbor_id, cosine,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         | FROM c)
         |SELECT query_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)
}
