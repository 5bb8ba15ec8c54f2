package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash LSH finds exactly the exact-jaccard pairs (recall 1 here)") {
    val exact = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
  }

  test("incremental minhash: exactly the full pair set restricted across the shard split") {
    // canonicalize (a,b) -> (min,max) so the cross-split orientation
    // (doc_a = new-shard doc) compares against the a<b full pair set
    val full = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }.toSet
    val inc = Dedup.dedupIncrementalMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(inc.forall { case (a, b) => a % 10 == 0 && b % 10 != 0 })
    val canon = inc.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(canon == full)
  }

  test("jaccard values are in (0,1] and symmetric by construction (a<b)") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= Dedup.JaccardThreshold && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("containment: bar respected, a<b, and jaccard pairs are a subset") {
    val rows = Dedup.dedupContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Double]("contain_a"), r.getAs[Double]("contain_b"))
      assert(math.max(ca, cb) >= Dedup.ContainBar && ca <= 1.0 && cb <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    // jaccard >= 0.8 implies both containments >= 0.8, so every such
    // pair must be present here (subset sanity between the two views).
    val cont = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    Dedup.dedupNgramJaccard(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8)
      .foreach { r =>
        assert(cont.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
      }
  }

  test("exact dedup groups: n_docs sums to table size, keep_id is min") {
    val df = Dedup.dedupExact(spark, sf)
    val total = df.agg(sum("n_docs")).head.getLong(0)
    assert(total == sources.Tables.documents(spark, sf).count())
  }

  test("simhash: identical texts get hamming 0; pairs are plausible") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("clusters: reps are minimal, closed under the pair graph") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    clusters.foreach { case (doc, rep) => assert(rep <= doc) }
    // representative of a representative is itself
    clusters.values.foreach(rep => assert(clusters(rep) == rep))
    // both ends of every near-dup pair share a cluster
    Dedup.dedupNgramJaccard(spark, sf).collect().foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("clusterPairs: adversarial 512-node chain converges in O(log n) rounds, one cluster") {
    import spark.implicits._
    // the worst case for plain min-label propagation: a single path
    // 0-1-2-...-511, diameter n-1 — propagation alone needs ~n rounds
    // (and mis-labels under any fixed cap), pointer doubling must land
    // it in ~log2(n)
    val n = 512
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.clusterPairs(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "chain must collapse to one cluster rooted at 0")
    val bound = (math.log(n) / math.log(2)).toInt + 4
    assert(rounds <= bound, s"took $rounds rounds on a $n-chain, bound $bound")
  }

  test("clusterPairs: mixed components (chain + star + singleton pair) label to component minima") {
    import spark.implicits._
    val pairs = ((100L to 119L).sliding(2).map(s => (s(0), s(1))) ++  // 20-chain
      Seq((0L, 7L), (0L, 9L), (0L, 13L)) ++                           // star at 0
      Seq((55L, 54L))).toSeq.toDF("doc_a", "doc_b")                   // reversed pair
    val (labels, _) = Dedup.clusterPairs(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 119L).foreach(i => assert(got(i) == 100L))
    Seq(0L, 7L, 9L, 13L).foreach(i => assert(got(i) == 0L))
    Seq(54L, 55L).foreach(i => assert(got(i) == 54L))
  }

  test("pca power: loadings match an independent covariance fit; Rayleigh near the true top eigenvalue") {
    val dims = Similarity.PcaDims
    val q = graft.sources.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        s"transform(slice(embedding, 1, $dims), x -> cast(round(cast(x AS double) * 127, 0) AS bigint))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = q.length
    val sum = new Array[Long](dims)
    val gram = Array.ofDim[Long](dims, dims)
    q.foreach { v =>
      for (i <- 0 until dims) { sum(i) += v(i); for (j <- 0 until dims) gram(i)(j) += v(i) * v(j) }
    }
    val c = Array.tabulate(dims, dims)((i, j) =>
      (gram(i)(j) - (sum(i) * sum(j)).toDouble / n) / (n - 1))
    // long-run power iteration = the true dominant eigenpair
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to 200) {
      val w = Array.tabulate(dims)(i => (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    val num = (for (i <- 0 until dims; j <- 0 until dims) yield v(i) * c(i)(j) * v(j)).sum
    val den = v.map(x => x * x).sum
    val lambdaTrue = num / den
    val trace = (0 until dims).map(i => c(i)(i)).sum
    val rows = Similarity.embPcaPower(spark, sf).collect()
    assert(rows.length == dims)
    val eig = rows.head.getAs[Double]("eigval")
    val frac = rows.head.getAs[Double]("var_frac")
    assert(rows.forall(r => r.getAs[Double]("eigval") == eig))
    // Rayleigh quotient of the 3-iteration vector is bounded by and
    // close to the true dominant eigenvalue
    assert(eig <= lambdaTrue * (1 + 1e-6), s"$eig > $lambdaTrue")
    assert(eig >= lambdaTrue * 0.9, s"3 iterations too far from convergence: $eig vs $lambdaTrue")
    assert(frac > 0.0 && frac <= 1.0 && math.abs(frac - eig / trace) < 1e-5)
    // loadings align with the converged direction (cosine close to 1)
    val load = rows.sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("loading"))
    val cos = {
      val d = load.zip(v).map { case (a, b) => a * b }.sum
      d / math.sqrt(load.map(x => x * x).sum) / math.sqrt(v.map(x => x * x).sum)
    }
    assert(math.abs(cos) > 0.99, s"loading direction off: cos=$cos")
  }

  test("pca top-r: component 1 = single-component row, eigvals ordered, loadings pairwise orthogonal") {
    val rows = Similarity.embPcaTopr(spark, sf).collect()
    val dims = Similarity.PcaDims
    assert(rows.length == Similarity.PcaTopR * dims)
    val byComp = rows.groupBy(_.getAs[Long]("component"))
      .view.mapValues(_.sortBy(_.getAs[Long]("dim"))).toMap
    // component 1 reproduces emb_pca_power exactly (same trajectory,
    // deflation starts after it)
    val single = Similarity.embPcaPower(spark, sf).collect().sortBy(_.getAs[Long]("dim"))
    byComp(1L).zip(single).foreach { case (a, b) =>
      assert(a.getAs[Double]("loading") == b.getAs[Double]("loading"))
      assert(a.getAs[Double]("eigval") == b.getAs[Double]("eigval"))
    }
    // explained variance ordered within tolerance: the synthetic
    // spectrum is FLAT below the top (λ₂ ≈ λ₃ within ~3%), and with a
    // near-degenerate pair a fixed-step deflated power iteration
    // cannot strictly order the approximations — Rayleigh values of
    // consecutive components may swap by up to the degeneracy gap.
    // Pin what the method guarantees: component 1 strictly dominates,
    // and no later component exceeds an earlier one by more than 5%.
    val eigs = (1 to Similarity.PcaTopR)
      .map(r => byComp(r.toLong).head.getAs[Double]("eigval"))
    assert(eigs.head == eigs.max, s"component 1 not dominant: $eigs")
    assert(eigs.tail.forall(_ < eigs.head), s"component 1 not strict: $eigs")
    eigs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * 1.05, s"eigvals out of order beyond degeneracy tolerance: $eigs")
    }
    assert(eigs.forall(_ > 0.0))
    // var_frac shares the ORIGINAL trace: fractions positive, summed
    // mass under 1
    val fracs = (1 to Similarity.PcaTopR)
      .map(r => byComp(r.toLong).head.getAs[Double]("var_frac"))
    assert(fracs.forall(f => f > 0.0 && f < 1.0) && fracs.sum < 1.0)
    // pairwise orthogonality of the component directions
    def unit(r: Int): Array[Double] = {
      val l = byComp(r.toLong).map(_.getAs[Double]("loading")).toArray
      val n = math.sqrt(l.map(x => x * x).sum)
      l.map(_ / n)
    }
    for (a <- 1 to Similarity.PcaTopR; b <- a + 1 to Similarity.PcaTopR) {
      val d = unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d) < 0.05, s"components $a,$b not orthogonal: cos=$d")
    }
  }

  test("filtered ivfpq: label respected, ranks dense, candidates label-pure, gate flags green") {
    val rows = Similarity.annFilteredIvfpq(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val n = r.getAs[Long]("neighbor_id")
      // the predicate held: every result shares its query's label,
      // and the row's label column IS that label
      assert(labels(n) == labels(q), s"cross-label result $q -> $n")
      assert(r.getAs[Int]("label") == labels(q))
      assert(q != n)
    }
    // ranks dense 1..k per query (the filtered block is larger than k
    // for every label at this SF, so a full top-k must come back)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to Similarity.TopK).toSeq, s"ranks not dense for query $q")
    }
    // candidate generation itself never leaks a cross-label pair
    val cands = Similarity.ivfpqFilteredCandidates(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
    cands.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(0)), "cross-label candidate")
    }
    // quality/prune gate green at this SF
    val gate = Similarity.annFilteredIvfpqRecall(spark, sf).collect().head
    assert(gate.getAs[Long]("recall_ok") == 1L && gate.getAs[Long]("prune_ok") == 1L)
  }

  test("mmr: rank-1 is the relevance argmax, scores non-increasing, picks diversify vs top-k") {
    val mmr = Similarity.annMmrDiversify(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val bf = Similarity.annBruteforceTopk(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(mmr.keySet == bf.keySet && mmr.nonEmpty)
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    def meanPairwise(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.length
    }
    var mmrDiv = 0.0; var topDiv = 0.0
    mmr.foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("mmr_rank"))
      assert(byRank.length == Similarity.MmrK)
      assert(byRank.map(_.getAs[Long]("neighbor_id")).distinct.length == byRank.length)
      // greedy monotonicity: a growing selected set can only raise a
      // candidate's redundancy penalty, so the chosen score never rises
      val scores = byRank.map(_.getAs[Double]("mmr_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, scores.toSeq.toString)
      val bfRows = bf(qid).sortBy(_.getAs[Long]("rank"))
      assert(byRank.head.getAs[Long]("neighbor_id") == bfRows.head.getAs[Long]("neighbor_id"),
        "rank-1 must be the pure relevance argmax")
      mmrDiv += meanPairwise(byRank.map(_.getAs[Long]("neighbor_id")).toSeq)
      topDiv += meanPairwise(bfRows.map(_.getAs[Long]("neighbor_id")).toSeq)
    }
    // the point of the operator: across queries, MMR's picks are less
    // mutually similar than the plain relevance top-k's picks
    assert(mmrDiv < topDiv, s"no diversification: mmr=$mmrDiv topk=$topDiv")
  }

  test("brute-force topk: k rows per query, descending cosine") {
    val rows = Similarity.annBruteforceTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueryVecs)
    byQ.values.foreach { rs =>
      assert(rs.length == Similarity.TopK)
      val cos = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("LSH ANN: results are a subset of each query's true ranking direction") {
    val lsh = Similarity.annLshTopk(spark, sf).collect()
    // Sanity: every (query, neighbor) cosine from LSH must not exceed the
    // brute-force rank-1 cosine for that query.
    val bfTop = Similarity.annBruteforceTopk(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    lsh.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Double]("cosine") <= bfTop(q) + 1e-9)
    }
    // With 4 tables x 64 buckets every query should find candidates.
    val covered = lsh.map(_.getAs[Long]("query_id")).distinct.length
    assert(covered >= 8, s"only $covered/10 queries found LSH candidates")
  }

  test("IVF ANN: full top-k per query, cosine bounded by brute force") {
    val ivf = Similarity.annIvfTopk(spark, sf).collect()
    val byQ = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueryVecs)
    val bfTop = Similarity.annBruteforceTopk(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      assert(r.getAs[Double]("cosine") <= bfTop(r.getAs[Long]("query_id")) + 1e-9)
    }
  }

  test("k-means quantizer: deterministic, k centroids, 64 dims each") {
    val c1 = Similarity.kmeansCentroids(spark, sf)
    val c2 = Similarity.kmeansCentroids(spark, sf)
    assert(c1 == c2, "Lloyd's iterations must be deterministic")
    assert(c1.length == Similarity.NumCells)
    assert(c1.forall(_.length == 64))
    // centroids must have moved off the seed vectors (mean of a cell
    // with >1 member differs from any single member)
    val seeds = sources.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < Similarity.NumCells)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    assert(c1 != seeds, "centroids did not update — Lloyd's step is a no-op")
  }

  test("PQ codebooks: deterministic, full M x K tensor, centroids moved") {
    val b1 = Similarity.pqCodebooks(spark, sf)
    val b2 = Similarity.pqCodebooks(spark, sf)
    assert(b1 == b2, "codebook fit must be deterministic")
    assert(b1.size == Similarity.PqSubspaces * Similarity.PqCodes)
    assert(b1.values.forall(_.length == Similarity.PqSubDim))
    // the Lloyd's update must have moved the seeds
    val seeds = sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < Similarity.PqCodes)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    val seeded = seeds.zipWithIndex.exists { case (v, k) =>
      (0 until Similarity.PqSubspaces).forall { m =>
        b1((m, k)) == v.slice(m * Similarity.PqSubDim, (m + 1) * Similarity.PqSubDim)
      }
    }
    assert(!seeded, "codebooks did not update — Lloyd's step is a no-op")
  }

  test("PQ ANN: full top-k per query, exact re-rank bounds cosine by brute force") {
    val pq = Similarity.annPqTopk(spark, sf).collect()
    val byQ = pq.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueryVecs)
    byQ.values.foreach(rs => assert(rs.length == Similarity.TopK))
    val bf = Similarity.annBruteforceTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    val bfTop = bf.groupBy(_._1._1).view.mapValues(_.values.max).toMap
    pq.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(r.getAs[Double]("cosine") <= bfTop(q) + 1e-9)
      assert(n != q, "query returned as its own neighbor")
      // the refine step computes EXACT cosines: any (q, n) also in the
      // brute-force top-k must carry the identical rounded value
      bf.get((q, n)).foreach(exact => assert(r.getAs[Double]("cosine") == exact))
    }
  }

  test("int8 quantization: values bounded, reconstruction faithful") {
    val rows = Similarity.embQuantizeInt8(spark, sf).collect()
    assert(rows.length == sources.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("scale") > 0)
      // |q_i| <= 127 for 64 components
      assert(r.getAs[Long]("q_l1") <= 127L * 64)
      assert(math.abs(r.getAs[Long]("q_sum")) <= r.getAs[Long]("q_l1"))
      // max-abs int8 keeps the direction: cosine(v, q) stays near 1
      assert(r.getAs[Double]("recon_cosine") >= 0.999,
        s"vec ${r.getAs[Long]("vec_id")} recon ${r.getAs[Double]("recon_cosine")}")
    }
  }

  test("IVFPQ ANN: candidates confined to probed cells, exact re-rank bounds cosine") {
    val rows = Similarity.annIvfpqTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueryVecs)
    byQ.values.foreach(rs => assert(rs.length == Similarity.TopK))
    val bf = Similarity.annBruteforceTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    val bfTop = bf.groupBy(_._1._1).view.mapValues(_.values.max).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(n != q)
      assert(r.getAs[Double]("cosine") <= bfTop(q) + 1e-9)
      bf.get((q, n)).foreach(exact => assert(r.getAs[Double]("cosine") == exact))
    }
    // the coarse prune is real: every result's vector shares a probed
    // cell with its query (cellAssigned is the same deterministic fit)
    val cellOf = Similarity.cellAssigned(spark, sf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    rows.foreach { r =>
      // results came from ivfpqCandidates, so the neighbor's cell must
      // be among some probed cell — weaker but sufficient: candidate
      // sets are bounded by PqRefine per query
      assert(cellOf.contains(r.getAs[Long]("neighbor_id")))
    }
    byQ.values.foreach(rs => assert(rs.length <= Similarity.PqRefine))
  }

  test("multi-probe LSH: cosine bounded by brute force, probe budget respected") {
    val mp = Similarity.annMultiprobeTopk(spark, sf).collect()
    val bfTop = Similarity.annBruteforceTopk(spark, sf).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    mp.foreach { r =>
      assert(r.getAs[Double]("cosine") <= bfTop(r.getAs[Long]("query_id")) + 1e-9)
    }
    // query-directed probing: every query probes MpProbes of the
    // 2^MpPlanes buckets, so its candidate set is bounded by the
    // probed buckets' population — check the weaker invariant that
    // candidates stay under the prune bar (the gate's second flag)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val cand = Similarity.multiprobeCandidates(spark, sf).collect()
    cand.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.length <= n * Similarity.MpPruneBar, s"candidate blowup: ${g.length}/$n")
    }
    assert(mp.map(_.getAs[Long]("query_id")).distinct.length >= 8)
  }

  test("ANN recall gates: both flags pass at the calibrated bars") {
    Seq(Similarity.annLshRecall(spark, sf), Similarity.annIvfRecall(spark, sf),
      Similarity.annPqRecall(spark, sf), Similarity.annIvfpqRecall(spark, sf),
      Similarity.annBinaryRecall(spark, sf), Similarity.annMultiprobeRecall(spark, sf))
      .foreach { gate =>
        val r = gate.collect()
        assert(r.length == 1)
        assert(r(0).getAs[Long]("n_queries") == Similarity.NumQueryVecs)
        assert(r(0).getAs[Long]("recall_ok") == 1L, "macro-recall under bar")
        assert(r(0).getAs[Long]("prune_ok") == 1L, "candidate volume over bar")
      }
  }

  test("binary ANN: well-formed top-k, candidates within the rerank budget, exact cosines") {
    val rows = Similarity.annBinaryTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueryVecs)
    // exact brute-force cosines for cross-checking the rerank scores
    val bf = Similarity.annBruteforceTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to Similarity.TopK).toSeq)
      val cosines = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "cosine not descending")
    }
    // any binary hit that IS an exact top-k neighbor must carry the
    // identical rounded cosine (the rerank is exact, not approximate)
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(k).foreach(c => assert(c == r.getAs[Double]("cosine"), s"$k rerank drifted"))
    }
  }

  test("whitening: per-component ~zero mean / ~unit variance, components decorrelated") {
    val rows = Similarity.embWhiten(spark, sf).collect()
    val n = sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == (n * Similarity.PcaTopR).toInt)
    val byComp = rows.groupBy(_.getAs[Long]("component"))
      .view.mapValues(_.sortBy(_.getAs[Long]("vec_id")).map(_.getAs[Double]("w"))).toMap
    assert(byComp.keySet == (1L to Similarity.PcaTopR).toSet)
    byComp.foreach { case (c, ws) =>
      val mean = ws.sum / ws.length
      val varr = ws.map(x => (x - mean) * (x - mean)).sum / (ws.length - 1)
      assert(math.abs(mean) < 0.05, s"component $c mean $mean")
      assert(math.abs(varr - 1.0) < 0.1, s"component $c variance $varr")
    }
    // deflation-orthogonal components stay decorrelated after scaling
    for (a <- 1 to Similarity.PcaTopR; b <- (a + 1) to Similarity.PcaTopR) {
      val (wa, wb) = (byComp(a.toLong), byComp(b.toLong))
      val (ma, mb) = (wa.sum / wa.length, wb.sum / wb.length)
      val cov = wa.zip(wb).map { case (x, y) => (x - ma) * (y - mb) }.sum / (wa.length - 1)
      assert(math.abs(cov) < 0.1, s"components $a,$b correlated: $cov")
    }
  }

  test("incremental dedup: batch verdicts agree with a full recomputation") {
    val rows = Dedup.dedupIncremental(spark, sf).collect()
    assert(rows.nonEmpty)
    val keyed = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("k"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("k"))
    val corpusMin = keyed.filter(_._1 % 10 != 0)
      .groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val batch = keyed.filter(_._1 % 10 == 0).toMap
    assert(rows.length == batch.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 10 == 0)
      assert(r.getAs[String]("content_key") == batch(id))
      corpusMin.get(batch(id)) match {
        case Some(minId) =>
          assert(r.getAs[Long]("is_new") == 0L && r.getAs[Long]("dup_of") == minId, s"doc $id")
        case None =>
          assert(r.getAs[Long]("is_new") == 1L && r.isNullAt(3), s"doc $id")
      }
    }
    // the synthetic corpus has exact dups, so both verdicts must occur
    assert(rows.exists(_.getAs[Long]("is_new") == 0L), "no duplicate found in batch")
    assert(rows.exists(_.getAs[Long]("is_new") == 1L), "no new doc found in batch")
  }

  test("semantic dedup: drops exactly the vectors with a smaller within-cell neighbor") {
    val rows = Similarity.dedupSemantic(spark, sf).collect()
    val n = sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == n.toInt)
    // recompute within-cell qualifying neighbors from the exact pair
    // set restricted to same-cell (the exact path shares the rounding)
    val cells = Similarity.cellAssigned(spark, sf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val sameCellPairs = Similarity.dedupEmbeddingCosine(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
      .filter { case (a, b) => cells(a) == cells(b) }
    val expectedRep = sameCellPairs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("cell") == cells(id).toLong)
      expectedRep.get(id) match {
        case Some(rep) =>
          assert(r.getAs[Long]("keep") == 0L && r.getAs[Long]("rep_id") == rep, s"vec $id")
        case None =>
          assert(r.getAs[Long]("keep") == 1L && r.isNullAt(3), s"vec $id")
      }
    }
    assert(rows.exists(_.getAs[Long]("keep") == 0L), "no semantic dup dropped")
  }

  test("semantic dedup gate: flags pass; exact pair count matches the exact path") {
    val r = Similarity.dedupSemanticGate(spark, sf).collect()
    assert(r.length == 1)
    val nExact = Similarity.dedupEmbeddingCosine(spark, sf).count()
    assert(r(0).getAs[Long]("n_exact_pairs") == nExact)
    assert(r(0).getAs[Long]("recall_ok") == 1L, "within-cell recall under bar")
    assert(r(0).getAs[Long]("work_ok") == 1L, "cell scan cost over bar")
  }

  test("incremental ANN: shard searches base only, no refit, cells genuinely prune") {
    val rows = Similarity.annIvfIncrementalTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    // queries come from the arriving shard, neighbors from the base corpus
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") % 20 == 0, "query outside the shard split")
      assert(r.getAs[Long]("neighbor_id") % 20 != 0, "neighbor from the unindexed shard")
    }
    // per-query ranks contiguous from 1
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length))
    }
    // the probed-cell join must prune: candidates well under shard x base
    val e = graft.sources.Tables.embeddings(spark, sf)
    val nShard = e.filter(col("vec_id") % 20 === 0).count()
    val nBase = e.count() - nShard
    val nCand = Similarity.incrementalCandidates(spark, sf).count()
    assert(nCand < nShard * nBase * 0.7,
      s"no pruning: $nCand candidates for $nShard x $nBase")
    // search used the base-fitted quantizer, not a full-corpus refit
    assert(Similarity.baseCentroids(spark, sf) != Similarity.kmeansCentroids(spark, sf))
  }

  test("IVF upsert: shard absorbed under the stale quantizer, gate green, cells prune") {
    val rows = Similarity.annIvfUpsertTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-query ranks contiguous from 1, cosines non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).sameElements(1L to rs.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the shard was genuinely ABSORBED: upserted (vec_id % 20 == 0)
    // vectors are reachable as candidates of the grown index
    val cand = Similarity.upsertCandidates(spark, sf)
    assert(cand.filter(col("neighbor_id") % 20 === 0).count() > 0,
      "no shard vector reachable - the upsert did not grow the index")
    // stale geometry: the quantizer is the base fit, not a refit
    assert(Similarity.baseCentroids(spark, sf) != Similarity.kmeansCentroids(spark, sf))
    // probing prunes: candidates well under queries x corpus
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(cand.count() < Similarity.NumQueryVecs * n * Similarity.UpsertPruneBar,
      "candidate volume does not respect the prune bar")
    // the recall/prune gate itself is green on the grown corpus
    val gate = Similarity.annIvfUpsertRecall(spark, sf).collect().head
    assert(gate.getAs[Long]("recall_ok") == 1L, "stale quantizer below the recall bar")
    assert(gate.getAs[Long]("prune_ok") == 1L, "probe volume above the prune bar")
  }
}
