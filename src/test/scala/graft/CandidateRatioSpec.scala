package graft

import graft.operators.{Dedup, Similarity}

/** Blocking-selectivity lint for the LSH family: the fraction of the
  * corpus (or pair space) that survives candidate generation is THE
  * number that decides whether an approximate operator scales — a
  * parameter tweak that silently degrades blocking to near-brute-force
  * stays invisible at fixture sizes (the r8 annTopK banding collided
  * ~80% of the corpus per query and still benched fine at sf0.1).
  * These bounds make that class of regression a CI failure.
  *
  * Candidate sets are measured through the OPERATORS THEMSELVES with
  * the verify threshold disabled (minJ = -1 / maxHamming = nBits /
  * k = shortlist), so the lint exercises the exact shipping pipeline —
  * no replicated blocking logic to drift. Measured at sf0.01 (500
  * docs / 500 vectors): sf0.001's 50 rows are too few for a
  * selectivity ratio to mean anything.
  */
class CandidateRatioSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("sim_ann asymmetric-hash shortlist keeps < 5% of the corpus per query") {
    val n = Tables.embeddings(spark, sf01).count()
    // k = shortlist → the re-rank keeps the whole candidate set, so
    // the output IS the per-query candidate list
    val cand = Similarity.annTopK(spark, sf01, k = 24, shortlist = 24)
    val perQuery = cand.groupBy("qid").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    val ratio = perQuery.toDouble / n
    assert(ratio < 0.05, s"sim_ann candidate ratio $ratio (= $perQuery/$n) >= 0.05")
  }

  test("dedup_minhash_md5 banding keeps < 2% of the pair space") {
    val nDocs = Tables.documents(spark, sf01).count()
    val pairSpace = nDocs * (nDocs - 1) / 2.0
    // minJ = -1 disables the Jaccard verify: every banding candidate
    // survives to the output
    val cand = Dedup.minhashLshMd5(spark, sf01, minJ = -1.0).count()
    val ratio = cand / pairSpace
    assert(ratio < 0.02, s"minhash candidate ratio $ratio (= $cand/$pairSpace) >= 0.02")
  }

  test("trained near-dup blocking: no degenerate cell, and the lint is falsifiable") {
    import org.apache.spark.sql.functions.{count => fcount, max => fmax, lit, sum}
    // the shipping config: adaptive ceil(sqrt(n_u)) cells, nProbe=4.
    // A healthy codebook spreads multi-probe assignments so that no
    // single cell holds a degenerate share of the corpus — a collapsed
    // codebook (all centroids equal / one attractor cell) would put
    // ~100% of vectors in one cell and the verify join would silently
    // be all-pairs. Measured max share at sf0.01: 0.0495 of the n_u·4
    // assignment rows; 0.35 leaves drift margin while still failing
    // hard on collapse.
    def maxShare(cells: org.apache.spark.sql.DataFrame): Double = {
      val byCell = cells.groupBy("cell").agg(fcount(lit(1)).as("c"))
      val Array(mx, tot) = byCell.agg(fmax("c"), sum("c")).head()
        .toSeq.map(_.asInstanceOf[Long]).toArray
      mx.toDouble / tot
    }
    val share = maxShare(Similarity.blockingCells(spark, sf01))
    assert(share < 0.35, s"max cell share $share >= 0.35: codebook degenerating")
    // falsifiability: the SAME measurement must trip on a seeded
    // degenerate codebook (nCells=1 → every vector in one cell)
    val degenerate = maxShare(Similarity.blockingCells(spark, sf01, nCells = 1))
    assert(degenerate >= 0.35,
      s"lint not falsifiable: degenerate codebook measured share $degenerate")
  }

  test("dedup_simhash_md5 blocking: candidates <= 4x true pairs and < 8% of pair space") {
    val nDocs = Tables.documents(spark, sf01).count()
    val pairSpace = nDocs * (nDocs - 1) / 2.0
    // maxHamming = 60 (the signature width) disables the popcount
    // verify: every blocking candidate survives to the output
    val cand = Dedup.simhashPairsMd5(spark, sf01, maxHamming = 60).count()
    val truePairs = Dedup.simhashPairsMd5(spark, sf01).count()
    // the sf0.01 corpus genuinely contains ~2.35% true Hamming ≤ 3
    // pairs (2932/124750) — no COMPLETE blocking can emit fewer
    // candidates than true pairs, so the scale-relevant number is
    // candidate PRECISION: wasted verifies per true pair. The C(6,3)
    // combinatorial keys measure 2.8× (8102 candidates); the retired
    // 4×15-bit bands measured 7.7× (22687)
    assert(cand <= 4L * truePairs, s"simhash candidates $cand > 4x true pairs $truePairs")
    val ratio = cand / pairSpace
    assert(ratio < 0.08, s"simhash candidate ratio $ratio (= $cand/$pairSpace) >= 0.08")
  }
}
