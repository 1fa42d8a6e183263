package graft

/** Registry-wide physical-plan lint: the anti-patterns that sink a
  * 100 TB run must not appear in ANY query's plan, not just the
  * hand-audited flagships. Complements the per-query guards in
  * OperatorSpec/CooccurSpec/PlanRewriteSpec.
  */
class PlanLintSpec extends SparkSpec {

  // queries whose construction runs driver-side jobs (iterative loops,
  // sink writes) — their plan shape is guarded by their own specs
  private val eagerBuilders = Set("dedup_clusters", "dedup_clusters_star",
    "kv_roundtrip", "bloom_join", "bpe_vocab", "bpe_encode", "ivf_index_topk",
    "graph_pagerank", "mixture_temperature")

  // The EXACT set of queries that legitimately plan a
  // BroadcastNestedLoopJoin (enumerated by scanning the registry, kept
  // tight so a new accidental NLJ fails this test):
  //  - 1-row scalar-aggregate broadcasts (decorrelated subqueries /
  //    corpus totals): q11, q22, lm_score, lm_score2, tfidf_keywords,
  //    layout_zorder, sketch_cms, sketch_hll_merge, bm25_topk
  //  - intentional tiny-side range/theta joins: join_range_tiers,
  //    fuzzy_name_match (edit-distance over the broadcast dim,
  //    pre-pruned by the LevenshteinPrefilter length guard)
  //  - broadcast query/centroid sides in the similarity family (few
  //    rows against the corpus by design): sim_topk, sim_ivf,
  //    sim_*_recall, sim_neardup, sem_dedup_keep, hybrid_rrf,
  //    emb_kmeans, emb_pq_recall
  private val nljAllowed = Set(
    "q11_important", "q22_idle_balance", "lm_score", "lm_score2",
    "tfidf_keywords", "layout_zorder", "sketch_cms", "sketch_hll_merge",
    "bm25_topk", "join_range_tiers", "fuzzy_name_match",
    "histogram_equidepth", // 1-row percentile-edges broadcast
    "sim_topk", "sim_ivf", "sim_ann_recall", "sim_ivf_recall",
    "sim_neardup", "sem_dedup_keep", "hybrid_rrf", "emb_kmeans",
    "emb_pq_recall")

  test("no CartesianProduct in any registered query plan") {
    val offenders = SparkEntry.queries
      .filterNot { case (name, _) => eagerBuilders(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin only where a scalar/tiny broadcast is intended") {
    val offenders = SparkEntry.queries
      .filterNot { case (name, _) => eagerBuilders(name) || nljAllowed(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: $offenders (add to allowlist ONLY for 1-row/tiny broadcasts)")
  }
}
