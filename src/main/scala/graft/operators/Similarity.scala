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
  val NumTables = 4 // independent hash tables (union of candidates)
  val NumPlanes = 6 // bits per table: 64 buckets => ~n/64 mates each

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

  /** Block-pair decomposition factor for the exact all-pairs scan: 8
    * blocks ⇒ 36 unordered block pairs, each an independent task. At
    * cluster scale B is chosen so one block fits an executor's memory
    * (B ≈ corpusBytes / blockBytes); shuffle volume is O(n·(B+1)/2)
    * rows — each vector is replicated once per block it must meet.
    */
  val NumBlocks = 8

  /** Embedding near-dup pairs: cosine ≥ τ on the rounded value.
    *
    * Exact all-pairs at τ = 0.4 is inherently O(n²) compute — measured
    * on this corpus the qualifying pairs sit at cosine 0.40–0.60 (no
    * high-cosine cluster), where random-hyperplane LSH recall per
    * 6-plane table is (1 − acos(0.4)/π)⁶ ≈ 6%, i.e. ~200 tables for
    * recall ≈ 1 — so an LSH candidate path cannot hold the exact
    * oracle and the honest scale shape is a DISTRIBUTED block matrix
    * product (A·Aᵀ thresholded): vectors are assigned to [[NumBlocks]]
    * blocks and each unordered block pair (i ≤ j) is one shuffle
    * bucket. No driver collect, no corpus broadcast, no nested-loop
    * join — a shuffle-hash join on the block-pair key whose compute is
    * the unavoidable n²/2 codegen'd dot products, evenly spread across
    * B(B+1)/2 tasks. [[annLshTopk]] remains the approximate scale path
    * for top-k search where recall < 1 is acceptable.
    *
    * Pair uniqueness: for i < j a pair (x∈i, y∈j) meets exactly once
    * (x on the row side, y on the column side); for i = j both orders
    * meet, so the id filter keeps one. Division order matches the
    * oracle's `dot / nrm_a / nrm_b` with a = smaller id, so rounding
    * at 4 decimals is bit-identical.
    */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    val b = NumBlocks
    val e = withNorm(s, d).withColumn("blk", pmod(col("vec_id"), lit(b)).cast("int"))
    val rows = e.select(col("blk").as("bi"),
      explode(expr(s"sequence(blk, ${b - 1})")).as("bj"),
      col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val cols = e.select(explode(expr("sequence(0, blk)")).as("bi"),
      col("blk").as("bj"),
      col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    rows.hint("shuffle_hash").join(cols, Seq("bi", "bj"))
      .filter(col("bi") < col("bj") || col("ida") < col("idb"))
      .withColumn("cosine", round(
        dot(col("va"), col("vb")) /
          when(col("ida") < col("idb"), col("na")).otherwise(col("nb")) /
          when(col("ida") < col("idb"), col("nb")).otherwise(col("na")), 4))
      .filter(col("cosine") >= CosineThreshold)
      .select(least(col("ida"), col("idb")).as("vec_a"),
        greatest(col("ida"), col("idb")).as("vec_b"), col("cosine"))
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

  /** Random-hyperplane LSH ANN: 4 independent tables of 6
    * deterministic pseudo-random hyperplanes each; a vector's bucket
    * per table is the 6-bit sign pattern of its hyperplane dots.
    * Candidates = pairs sharing a bucket in ANY table (bucket-equality
    * join, union over tables), then exact cosine top-k within the
    * candidate set. Approximate (probabilistic recall) ⇒ rows-only
    * driver check; candidate quality asserted in the spec against the
    * brute-force baseline.
    */
  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val rng = new scala.util.Random(42)
    val planes: Seq[Seq[Seq[Double]]] =
      Seq.fill(NumTables, NumPlanes)(Seq.fill(64)(rng.nextGaussian()))
    val e = withNorm(s, d)
    // (table, bucket) pairs per vector — explode over the tables. The
    // hyperplane dot uses the codegen'd DotProduct against a literal
    // plane array (an aggregate/zip_with lambda is interpreted and
    // costs both runtime and janino compile).
    val bucketStructs = planes.zipWithIndex.map { case (tablePlanes, t) =>
      val bits = tablePlanes.zipWithIndex.map { case (p, i) =>
        when(dot(col("v"), typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bits.as("bkt"))
    }
    val eb = e.select(col("vec_id"), col("v"), col("nrm"),
        explode(array(bucketStructs: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val q = eb.filter(col("vec_id") < NumQueryVecs)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("nrma"), col("tbl"), col("bkt"))
    val n = eb.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("nrm").as("nrmb"), col("tbl"), col("bkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q).join(n, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", round(pairDot / col("nrma") / col("nrmb"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val NumCells = 8 // IVF coarse-quantizer cells
  val NumProbe = 2 // cells probed per query

  /** IVF-flavor ANN: a deterministic coarse quantizer (the first
    * [[NumCells]] vectors stand in for k-means centroids — the
    * container has no MLlib dependency surface in this build) assigns
    * every vector to its nearest cell; queries probe their
    * [[NumProbe]] nearest cells and rank candidates by exact cosine.
    * Cell assignment is a broadcast join against 8 centroids + one
    * window; candidate generation is a cell-equality join — the
    * inverted-file shape that scales to billions of vectors.
    * Approximate ⇒ rows-only driver check + spec assertions.
    */
  def annIvfTopk(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(s, d)
    val cent = e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("cent_id"), col("v").as("vc"), col("nrm").as("nrmc"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cent_id").asc)
    val assign = e.join(broadcast(cent), lit(true))
      .withColumn("sim", dot(col("v"), col("vc")) / col("nrm") / col("nrmc"))
      .withColumn("rk", row_number().over(wAssign))
    val cells = assign.filter(col("rk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("cell"),
        col("v").as("vb"), col("nrm").as("nrmb"))
    val probes = assign.filter(col("vec_id") < NumQueryVecs && col("rk") <= NumProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"),
        col("v").as("va"), col("nrm").as("nrma"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", round(pairDot / col("nrma") / col("nrmb"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_embedding_cosine" -> dedupEmbeddingCosine _,
    "ann_bruteforce_topk" -> annBruteforceTopk _,
    "ann_lsh_topk" -> annLshTopk _,
    "ann_ivf_topk" -> annIvfTopk _)

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
