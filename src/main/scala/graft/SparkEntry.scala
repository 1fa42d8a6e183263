package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is exposed as one `queries` entry; each
  * SQL-expressible one has a matching DuckDB oracle in [[oracleSql]]
  * (same column names, same deterministic ORDER BY, integer outputs
  * BIGINT on both sides, floats rounded identically). Entries without
  * an oracle (hash-family approximations, stubbed decode) get the
  * driver's rows-only check and are exact-verified in ScalaTest
  * against their oracle-checked counterparts.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.alpha(spark, "/root/testdata/sf0.001")

  /** Queries whose BUILDER runs Spark jobs (driver-orchestrated
    * loops, eager index/Bloom builds, streaming contract replays) —
    * their construction-time plans are history-dependent, so the
    * plan lints (PlanLintSpec) and the plan-count tool (PlanCount)
    * both skip them. ONE shared set so the two can never drift.
    */
  val eagerQueries: Set[String] = Set("dedup_clusters",
    "dedup_clusters_star", "dedup_keep_longest", "kv_roundtrip",
    "bloom_join", "bpe_vocab", "bpe_encode", "ivf_index_topk",
    "graph_pagerank", "mixture_temperature", "contamination_bloom",
    "stream_window_contract", "stream_dedup_contract",
    "stream_join_contract", "stream_neardup_contract",
    "stream_index_ingest",
    "emb_pca", "domain_classifier",
    "bm25_index_topk", "bm25_serve_topk", "bm25_refresh",
    "bm25_upsert_topk", "bm25_compact", "bm25_serve_asof",
    "bm25_serve_asof_mid",
    "ivf_serve_topk",
    "ivf_append_topk", "ivf_append_recall", "ivf_serve_removed",
    "ivf_retrain_topk", "ivf_serve_asof", "ivf_serve_asof_mid",
    "dedup_checkin", "dedup_checkin_removed", "dedup_checkin_capped",
    "dedup_lookup_asof", "dedup_lookup_asof_mid",
    "ingest_pipeline", "ingest_pipeline2", "fold_trigger", "index_health",
    "maintain_estate", "manifest_pinned", "manifest_replay",
    "recovery_drill", "train_read",
    "bm25_snapshot_asof", "estate_crash_drill",
    "neardup_snapshot_asof", "ivf_snapshot_asof",
    "estate_snapshot_manifest", "estate_stream_ingest",
    "mm_ivf_lifecycle", "audio_ivf_lifecycle",
    // r13: edges via driver-orchestrated distributed rank selection
    "histogram_equidepth")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference flagship: word count (ops #1-#9, #15-#21) ----
    "wordcount_alpha"    -> (WordCount.alpha(_, _)),
    "wordcount_filtered" -> (WordCount.filtered(_, _)),
    "wordcount_flatmap"  -> (WordCount.flatMapTokens(_, _)),
    "kv_roundtrip"       -> (graft.sources.TextIO.kvRoundTrip(_, _)),
    // ---- relational core ----
    "q1_pricing"     -> (Relational.pricingSummary(_, _)),
    "filter_project" -> (Relational.filterProject(_, _)),
    "topk_orders"    -> (Relational.topkOrders(_, _)),
    "distinct_agg"   -> (Relational.distinctAgg(_, _)),
    "agg_stats"      -> (Relational.aggStats(_, _)),
    "set_union"      -> (Relational.setUnion(_, _)),
    "set_intersect"  -> (Relational.setIntersect(_, _)),
    "set_except"     -> (Relational.setExcept(_, _)),
    "set_union_all"  -> (Relational.setUnionAll(_, _)),
    "grouping_sets"  -> (Relational.groupingSetsQty(_, _)),
    "scalar_string"  -> (Relational.scalarString(_, _)),
    "scalar_date"    -> (Relational.scalarDate(_, _)),
    "scalar_math"    -> (Relational.scalarMath(_, _)),
    "json_extract"   -> (Relational.jsonExtract(_, _)),
    "udaf_geomean"   -> (Relational.geoMeanQty(_, _)),
    "sql_q1"         -> (Relational.sqlPricingSummary(_, _)),
    "histogram_prices" -> (Relational.histogramPrices(_, _)),
    "map_funcs"      -> (Relational.mapFuncs(_, _)),
    "sketch_approx"  -> (Relational.sketches(_, _)),
    // oracle-checked since r10: exact counts + contract booleans
    // (est_within_5pct / merge_within_5pct / median rank) pinned TRUE
    "sketch_hll_merge" -> (Relational.hllMerge(_, _)),
    "sketch_kll_merge" -> (Relational.kllMerge(_, _)),
    "scalar_regex"   -> (Relational.scalarRegex(_, _)),
    "date_arith"     -> (Relational.dateArith(_, _)),
    "array_stats"    -> (Relational.arrayStats(_, _)),
    "pivot_orders"   -> (Relational.pivotOrders(_, _)),
    "above_avg"      -> (Relational.aboveAvgOrders(_, _)),
    "percentiles"    -> (Relational.percentiles(_, _)),
    "salted_wordcount" -> (Relational.saltedWordCount(_, _)),
    "unpivot_part"   -> (Relational.unpivotPart(_, _)),
    // ---- joins ----
    "join_inner_nation"  -> (Joins.innerPerNation(_, _)),
    "join_q3_shipping"   -> (Joins.shippingPriority(_, _)),
    "join_left_orders"   -> (Joins.leftOuterOrders(_, _)),
    "join_semi_highval"  -> (Joins.semiHighValue(_, _)),
    "join_anti_noorders" -> (Joins.antiNoOrders(_, _)),
    "join_broadcast_dims" -> (Joins.broadcastDims(_, _)),
    "join_range_tiers"   -> (Joins.rangeJoinTiers(_, _)),
    "join_skew_salted"   -> ((s, d) => Joins.saltedSkewJoin(s, d)),
    "bloom_join"         -> ((s, d) => Joins.bloomPrefilteredJoin(s, d)),
    "join_interval"      -> (Joins.intervalClickPurchase(_, _)),
    "q5_local_supplier"  -> (Joins.localSupplierVolume(_, _)),
    "q10_returned_items" -> (Joins.returnedItemCustomers(_, _)),
    "q14_promo_share"    -> (Joins.promoRevenueShare(_, _)),
    "q19_brand_quantity" -> (Joins.brandQuantityRevenue(_, _)),
    "q6_forecast"        -> (Joins.forecastRevenue(_, _)),
    "q15_top_supplier"   -> (Joins.topSupplier(_, _)),
    "q18_large_orders"   -> ((s, d) => Joins.largeVolumeOrders(s, d)),
    "q4_priority"        -> (Joins.orderPriorityCheck(_, _)),
    "q7_nation_volume"   -> ((s, d) => Joins.nationVolume(s, d)),
    "q12_late_mix"       -> (Joins.latePriorityMix(_, _)),
    "q13_custdist"       -> (Joins.orderDistribution(_, _)),
    "q17_small_qty"      -> (Joins.smallQtyRevenue(_, _)),
    "q22_idle_balance"   -> (Joins.idleBalanceCustomers(_, _)),
    "q2_min_cost"        -> (Joins.minCostSupplier(_, _)),
    "q8_market_share"    -> (Joins.marketShare(_, _)),
    "q9_profit"          -> (Joins.profitByNation(_, _)),
    "q11_important"      -> (Joins.importantParts(_, _)),
    "q16_supplier_cnt"   -> (Joins.supplierCountByPart(_, _)),
    "q20_excess"         -> (Joins.excessSuppliers(_, _)),
    "q21_waiting"        -> (Joins.waitingSuppliers(_, _)),
    // ---- windows & grouping sets ----
    "win_rank"    -> (Windows.rankPerCustomer(_, _)),
    "win_running" -> (Windows.runningTotal(_, _)),
    "win_lag"     -> (Windows.lagDelta(_, _)),
    "rollup_qty"  -> (Windows.rollupQty(_, _)),
    "cube_orders" -> (Windows.cubeOrders(_, _)),
    "win_range_frame" -> (Windows.trailingHourCount(_, _)),
    "typed_order_gaps" -> (Windows.typedOrderGaps(_, _)),
    "win_distribution" -> (Windows.distributionRanks(_, _)),
    "bool_aggs"        -> (Relational.boolAggs(_, _)),
    "win_quartiles"   -> (Windows.quartiles(_, _)),
    // ---- time series (batch forms; streaming variants in graft.streaming) ----
    "ts_hourly"    -> (TimeSeries.hourlyEvents(_, _)),
    "ts_sessionize" -> (TimeSeries.sessionize(_, _)),
    "ts_asof"      -> (TimeSeries.asofPurchaseSignup(_, _)),
    "event_funnel" -> ((s, d) => TimeSeries.eventFunnel(s, d)),
    "ts_fill"      -> (TimeSeries.gapFill(_, _)),
    "ts_anomaly"   -> ((s, d) => TimeSeries.anomalies(s, d)),
    "ts_m4"        -> (TimeSeries.m4Downsample(_, _)),
    "retention_cohorts" -> (TimeSeries.retentionCohorts(_, _)),
    "ts_session_window" -> (TimeSeries.sessionWindows(_, _)),
    "ts_asof_nearest" -> ((s, d) => TimeSeries.asofNearest(s, d)),
    // eager builders: run a REAL Structured Streaming job (file
    // source → watermark → stateful op → memory sink) and emit
    // batch-equivalence booleans the oracle replays — the r10
    // sketch-contract pattern promoting the streaming surface into
    // driver-checked CORRECTNESS rows
    "stream_window_contract" ->
      ((s, d) => graft.streaming.Streaming.windowContract(s, d)),
    "stream_dedup_contract" ->
      ((s, d) => graft.streaming.Streaming.dedupContract(s, d)),
    "stream_join_contract" ->
      ((s, d) => graft.streaming.Streaming.joinContract(s, d)),
    "stream_neardup_contract" ->
      ((s, d) => graft.streaming.Streaming.nearDupContract(s, d)),
    "stream_index_ingest" ->
      ((s, d) => graft.streaming.Streaming.indexIngestContract(s, d)),
    // ---- co-occurrence / graph ----
    "assoc_pairs"    -> (Cooccur.assocPairs(_, _)),
    "graph_pagerank" -> (Cooccur.pagerank(_, _)),
    "graph_triangles" -> (Cooccur.triangles(_, _)),
    // ---- text analysis ----
    "text_langstats"   -> (TextAnalysis.langStats(_, _)),
    "text_quality"     -> (TextAnalysis.qualityScore(_, _)),
    "text_tokens"      -> (TextAnalysis.tokenCounts(_, _)),
    "text_langid"      -> (TextAnalysis.langId(_, _)),
    "text_fingerprint" -> (TextAnalysis.fingerprints(_, _)),
    "text_rollhash"    -> (TextAnalysis.rollingHash(_, _)),
    "text_entropy"     -> (TextAnalysis.charEntropy(_, _)),
    "text_langid_ngram" -> (TextAnalysis.langIdNgram(_, _)),
    "fuzzy_name_match"  -> ((s, d) => TextAnalysis.fuzzyNameMatch(s, d)),
    "text_repetition"   -> (TextAnalysis.repetitionScore(_, _)),
    "text_vocab"        -> (TextAnalysis.vocabStats(_, _)),
    "pii_scan"          -> (TextAnalysis.piiScan(_, _)),
    "tfidf_keywords"    -> ((s, d) => TextAnalysis.tfidfKeywords(s, d)),
    "bm25_topk"         -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    "doc_chunks"        -> ((s, d) => TextAnalysis.docChunks(s, d)),
    "quality_rules"     -> ((s, d) => TextAnalysis.gopherRules(s, d)),
    "bpe_pairs"         -> ((s, d) => TextAnalysis.bpePairs(s, d)),
    // iterative merge recurrences — no SQL oracle; BpeSpec verifies
    // the merge table AND per-doc encode counts exactly against a
    // single-node reference BPE
    "bpe_vocab"         -> ((s, d) => TextAnalysis.bpeVocab(s, d)),
    "bpe_encode"        -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    // ---- corpus curation ----
    "sample_split"      -> (Curation.sampleSplit(_, _)),
    "contamination"     -> ((s, d) => Curation.benchmarkContamination(s, d)),
    "cross_dedup"       -> ((s, d) => Curation.crossDedup(s, d)),
    "contamination_bloom" -> ((s, d) => Curation.contaminationBloom(s, d)),
    "contamination_semantic" -> ((s, d) => Similarity.contaminationSemantic(s, d)),
    // ---- trained-model operators ----
    "emb_pca"           -> ((s, d) => Models.embPca(s, d)),
    "domain_classifier" -> ((s, d) => Models.domainClassifier(s, d)),
    "split_leak_free"   -> (Curation.leakFreeSplit(_, _)),
    "quality_gate"      -> (Curation.qualityGate(_, _)),
    "curate_pipeline"   -> (Curation.curatePipeline(_, _)),
    "mixture_sample"    -> (Curation.mixtureSample(_, _)),
    "stratified_sample" -> (Curation.stratifiedSample(_, _)),
    "mixture_temperature" -> ((s, d) => Curation.temperatureMix(s, d)),
    "weighted_sample" -> ((s, d) => Curation.weightedSample(s, d)),
    "train_shuffle"   -> ((s, d) => Curation.trainShuffle(s, d)),
    "train_manifest"  -> ((s, d) => Curation.trainManifest(s, d)),
    "corpus_diff"     -> ((s, d) => Curation.corpusDiff(s, d)),
    "source_datacard" -> ((s, d) => Curation.sourceDatacard(s, d)),
    "dsir_sample"     -> ((s, d) => Curation.dsirSample(s, d)),
    "dp_release"      -> ((s, d) => Curation.dpRelease(s, d)),
    "bm25_index_topk" -> ((s, d) => TextAnalysis.bm25IndexTopK(s, d)),
    "bm25_serve_topk" -> ((s, d) => TextAnalysis.bm25ServeTopK(s, d)),
    "bm25_refresh"    -> ((s, d) => TextAnalysis.bm25Refresh(s, d)),
    "bm25_upsert_topk" -> ((s, d) => TextAnalysis.bm25UpsertTopK(s, d)),
    "bm25_serve_asof"  -> ((s, d) => TextAnalysis.bm25ServeAsOfTopK(s, d)),
    "bm25_serve_asof_mid" -> ((s, d) => TextAnalysis.bm25ServeAsOfMidTopK(s, d)),
    "bm25_compact"    -> ((s, d) => TextAnalysis.bm25CompactTopK(s, d)),
    "ppl_buckets"     -> ((s, d) => TextAnalysis.pplBuckets(s, d)),
    "emb_outliers"    -> ((s, d) => Similarity.embOutliers(s, d)),
    "lm_score"          -> ((s, d) => TextAnalysis.lmScore(s, d)),
    "colloc_pmi"        -> ((s, d) => TextAnalysis.collocPmi(s, d)),
    "heavy_hitters"     -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "mask_spans"        -> (TextAnalysis.maskSpans(_, _)),
    "lm_score2"         -> ((s, d) => TextAnalysis.lmScore2(s, d)),
    "emb_quantize"      -> (Similarity.embQuantize(_, _)),
    "emb_rp"            -> ((s, d) => Similarity.randomProjection(s, d)),
    // ---- dedup family ----
    "dedup_exact"   -> (Dedup.exact(_, _)),
    "dedup_ngram"   -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_keep_longest" -> ((s, d) => Dedup.dedupKeepLongest(s, d)),
    "dedup_clusters_star" -> ((s, d) => Dedup.dedupClustersStar(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_minhash_md5" -> ((s, d) => Dedup.minhashLshMd5(s, d)),
    // eager builder: at-rest near-dup index — check the held-out
    // delta in against the indexed 3/4 without re-signaturing it
    "dedup_checkin" -> ((s, d) => Dedup.neardupUpsert(s, d)),
    "dedup_lookup_asof" -> ((s, d) => Dedup.neardupLookupAsOfRow(s, d)),
    "dedup_lookup_asof_mid" -> ((s, d) => Dedup.neardupLookupAsOfMidRow(s, d)),
    "dedup_checkin_removed" -> ((s, d) => Dedup.neardupUpsertRemoved(s, d)),
    "dedup_checkin_capped" -> ((s, d) => Dedup.neardupUpsertCapped(s, d)),
    // eager composite: delta diff -> near-dup gate (dry-run lookup)
    // -> bm25 refresh with the surviving delta -> pruned serve
    "ingest_pipeline" -> ((s, d) => Curation.ingestPipeline(s, d)),
    "ingest_pipeline2" -> ((s, d) => Curation.ingestPipeline2(s, d)),
    // fold-trigger policy contract across all three index families:
    // quiet on pristine, fires over budget, clears after the fold,
    // fold preserves/restores semantics (raw margins to stderr)
    "fold_trigger" -> ((s, d) => Curation.foldTriggerContract(s, d)),
    "index_health" -> ((s, d) => Curation.indexHealth(s, d)),
    "maintain_estate" -> ((s, d) => Curation.maintainEstate(s, d)),
    "manifest_pinned" -> ((s, d) => Curation.manifestPinned(s, d)),
    "manifest_replay" -> ((s, d) => Curation.manifestReplay(s, d)),
    "recovery_drill" -> ((s, d) => Curation.recoveryDrill(s, d)),
    "train_read" -> ((s, d) => Curation.trainRead(s, d)),
    "bm25_snapshot_asof" -> ((s, d) => TextAnalysis.bm25SnapshotAsOf(s, d)),
    "estate_crash_drill" -> ((s, d) => Curation.estateCrashDrill(s, d)),
    "estate_snapshot_manifest" ->
      ((s, d) => Curation.estateSnapshotManifest(s, d)),
    "estate_stream_ingest" ->
      ((s, d) => Curation.estateStreamIngest(s, d)),
    "neardup_snapshot_asof" -> ((s, d) => Dedup.neardupSnapshotAsOf(s, d)),
    "ivf_snapshot_asof" -> ((s, d) => Similarity.ivfSnapshotAsOf(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_simhash_md5" -> ((s, d) => Dedup.simhashPairsMd5(s, d)),
    "dedup_blocks"  -> ((s, d) => Dedup.blockDedup(s, d)),
    "dedup_prune"   -> ((s, d) => Dedup.boilerplatePrune(s, d)),
    "dedup_winnow"  -> ((s, d) => Dedup.winnowPairs(s, d)),
    "dedup_spans"   -> ((s, d) => Dedup.spanDedup(s, d)),
    "dedup_span_regions" -> ((s, d) => Dedup.spanRegions(s, d)),
    "profile_stats" -> (Relational.profileStats(_, _)),
    "skew_profile"  -> (Relational.skewProfile(_, _)),
    "merge_upsert"  -> (Relational.mergeUpsert(_, _)),
    "sketch_cms"    -> ((s, d) => Relational.cmsTopK(s, d)),
    "histogram_equidepth" -> (Relational.histogramEquidepth(_, _)),
    "histogram_equidepth_approx" -> (Relational.histogramEquidepthApprox(_, _)),
    "stats_moments" -> (Relational.statsMoments(_, _)),
    // ---- similarity search ----
    "sim_topk"    -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "hybrid_rrf"  -> ((s, d) => Similarity.hybridRrf(s, d)),
    "sim_neardup" -> ((s, d) => Similarity.embeddingNearDup(s, d)),
    "sim_ann"     -> ((s, d) => Similarity.annTopK(s, d)),
    "sim_ann_md5" -> ((s, d) => Similarity.annTopKMd5(s, d)),
    "sim_ivf"     -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sim_ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    "sim_ivf_recall" -> ((s, d) => Similarity.ivfRecall(s, d)),
    "emb_kmeans"  -> ((s, d) => Similarity.embKmeans(s, d)),
    // eager builder: writes the cell-partitioned index, then serves
    // from it with partition pruning (the kv_roundtrip pattern)
    "ivf_index_topk" -> ((s, d) => Similarity.ivfIndexTopK(s, d)),
    "ivf_serve_topk" -> ((s, d) => Similarity.ivfServeTopK(s, d)),
    "ivf_serve_asof" -> ((s, d) => Similarity.ivfServeAsOf(s, d)),
    "ivf_serve_asof_mid" -> ((s, d) => Similarity.ivfServeAsOfMid(s, d)),
    "ivf_append_topk" -> ((s, d) => Similarity.ivfAppendTopK(s, d)),
    "ivf_append_recall" -> ((s, d) => Similarity.ivfAppendRecall(s, d)),
    "ivf_serve_removed" -> ((s, d) => Similarity.ivfServeRemoved(s, d)),
    "ivf_retrain_topk" -> ((s, d) => Similarity.ivfRetrainTopK(s, d)),
    "sem_dedup_keep" -> ((s, d) => Similarity.semanticKeep(s, d)),
    "layout_zorder"  -> ((s, d) => graft.sources.Layout.zorderOrders(s, d)),
    "emb_pq"         -> ((s, d) => Similarity.productQuantize(s, d)),
    "emb_pq_recall"  -> ((s, d) => Similarity.pqRecall(s, d)),
    // ---- multimodal plumbing ----
    "mm_meta"     -> (Multimodal.mediaMeta(_, _)),
    // REAL codec path: PNG/JPEG bytes encoded and decoded by
    // javax.imageio; the oracle recomputes dims + the lossless PNG
    // pixel sum from the generating formulas
    "mm_features" -> (Multimodal.imageFeatures(_, _)),
    // REAL WAV path: PCM → RIFF container encode → decode → features;
    // PCM-in-WAV is lossless so the oracle replays the formula
    "mm_audio"    -> (Multimodal.audioFeatures(_, _)),
    // perceptual dedup over REAL decoded PNG bytes; integer-exact
    // average hash, so the oracle replays decode→hash→bands→verify
    "mm_phash_dedup" -> ((s, d) => Multimodal.phashDedup(s, d)),
    "mm_ivf_lifecycle" -> ((s, d) => Multimodal.mmIvfLifecycle(s, d)),
    "audio_ivf_lifecycle" -> ((s, d) => Multimodal.audioIvfLifecycle(s, d)),
    // ---- sequence packing (custom LogicalPlan+SparkPlan; no SQL
    //      oracle: greedy packing is a sequential recurrence —
    //      PackingSpec pins budget/density/determinism invariants) ----
    "seq_pack"    -> ((s, d) => Packing.seqPack(s, d)),
    // prefix-sum twin: concatenate-then-split binning is a pure
    // cumsum, so it IS SQL-expressible and oracle-hash-checked
    "seq_pack_sql" -> ((s, d) => Packing.seqPackSql(s, d)),
    // padding-efficiency batching: global quartile buckets + md5
    // shards, batches within (shard, bucket) — fully SQL-replayable
    "batch_pack"   -> ((s, d) => Packing.batchPack(s, d)),
    "mm_frames"   -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.sampleFrames(s, d).toDF()
        .groupBy(col("media_id")).agg(
          count(lit(1)).as("n_frames"),
          sum(col("n_bytes")).as("sampled_bytes"))
        .orderBy("media_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "wordcount_alpha" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    // same SQL as wordcount_alpha: the Spark side routes through the
    // writeKV text sink + KVDataSource V2 read-back, so a green hash
    // certifies the on-disk "key value" format round-trips losslessly
    "kv_roundtrip" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "wordcount_filtered" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
        |WHERE word <> '' AND regexp_matches(word, '^[m-qM-Q]')
        |GROUP BY word ORDER BY word""".stripMargin,
    "wordcount_flatmap" ->
      """SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
        |FROM (SELECT doc_id, unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        | round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice * CAST(0.9 AS DOUBLE) AS discounted, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "distinct_agg" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows FROM lineitem""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag, round(min(l_extendedprice), 2) AS min_price,
        | round(max(l_extendedprice), 2) AS max_price,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(stddev_samp(l_discount), 6) AS sd_disc, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_union" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
        |UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0 ORDER BY k""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0 ORDER BY k""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0 ORDER BY k""".stripMargin,
    "set_union_all" ->
      """SELECT k, count(*) AS n FROM (
        | SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
        | UNION ALL SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
        |GROUP BY k ORDER BY k""".stripMargin,
    "grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        | coalesce(l_linestatus, 'ALL') AS lstatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rflag, lstatus""".stripMargin,
    "scalar_string" ->
      """SELECT c_custkey, upper(c_name) AS name_upper, substring(c_name, 1, 8) AS name_prefix,
        | CAST(length(c_name) AS BIGINT) AS name_len,
        | regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked,
        | concat_ws('|', c_mktsegment, c_name) AS seg_name,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
        | CAST(quarter(o_orderdate) AS BIGINT) AS q,
        | strftime(o_orderdate, '%Y-%m-%d') AS ymd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, round(abs(l_extendedprice - 30000.0), 2) AS abs_diff,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
        | round(sqrt(l_extendedprice), 6) AS price_sqrt,
        | round(ln(l_extendedprice + 1.0), 6) AS price_ln,
        | CAST(l_orderkey % 97 AS BIGINT) AS key_mod
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    "udaf_geomean" ->
      """SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "histogram_prices" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) * 50000 AS BIGINT) AS bucket_lo,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket_lo""".stripMargin,
    "sql_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "map_funcs" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types,
        | count(*) FILTER (event_type = 'click') AS clicks,
        | count(*) FILTER (event_type = 'purchase') AS purchases,
        | array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id AS media_id,
        | CAST(ceil((strlen(text) // 32) / 4.0) AS BIGINT) AS n_frames,
        | CAST(ceil((strlen(text) // 32) / 4.0) * 32 AS BIGINT) AS sampled_bytes
        |FROM documents WHERE strlen(text) >= 32 ORDER BY media_id""".stripMargin,
    "scalar_regex" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        | regexp_matches(c_name, '[0-9]{3}') AS has3digits,
        | split_part(c_name, '#', 2) AS name_tail
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "date_arith" ->
      """SELECT o_orderkey,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-06-17') AS BIGINT) AS days_to_mid,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        | CAST(isodow(o_orderdate) AS BIGINT) AS isodow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "array_stats" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        | list_min(CAST(embedding AS DOUBLE[])) AS vmin,
        | list_max(CAST(embedding AS DOUBLE[])) AS vmax,
        | round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vsum,
        | round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS vsq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "pivot_orders" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_orderstatus = 'F') AS n_f,
        | count(*) FILTER (o_orderstatus = 'O') AS n_o,
        | count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice) FROM orders i
        |  WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "salted_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "unpivot_part" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "win_range_frame" ->
      """SELECT user_id, event_id, count(*) OVER (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_distribution" ->
      """SELECT o_custkey, o_orderkey,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "bool_aggs" ->
      """SELECT o_custkey,
        | bool_or(o_totalprice > 200000.0) AS any_high,
        | bool_and(o_totalprice > 0.0) AS all_positive,
        | count(*) FILTER (o_orderstatus = 'F') AS n_final,
        | count(*) AS n
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "typed_order_gaps" ->
      """WITH t AS (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS us FROM orders),
        |g AS (SELECT o_custkey, us - lag(us, 1) OVER
        |   (PARTITION BY o_custkey ORDER BY us ASC, o_orderkey ASC) AS gap FROM t)
        |SELECT o_custkey, count(*) AS n_orders,
        | CAST(coalesce(max(gap // 86400000000), 0) AS BIGINT) AS max_gap_days
        |FROM g GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "win_quartiles" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | first_value(o_orderkey) OVER wf AS first_key,
        | last_value(o_orderkey) OVER wf AS last_key
        |FROM orders WINDOW
        | w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        | wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "join_inner_nation" ->
      """SELECT n_name, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_q3_shipping" ->
      """SELECT l_orderkey, o_orderpriority,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "join_left_orders" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(CAST(coalesce(sum(o_totalprice), 0.0) AS DOUBLE), 2) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_semi_highval" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti_noorders" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_broadcast_dims" ->
      """SELECT r_name, count(*) AS n_suppliers, round(CAST(sum(s_acctbal) AS DOUBLE), 2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_range_tiers" ->
      """SELECT tier, count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders JOIN (VALUES ('T1_low', 0.0, 100000.0), ('T2_mid', 100000.0, 250000.0),
        | ('T3_high', 250000.0, 1000000000.0)) AS t(tier, lo, hi)
        |ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    // oracle is the PLAIN join: salting must be result-invariant
    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
        |FROM (SELECT CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE o_custkey END AS hk,
        |        o_totalprice FROM orders) o
        |JOIN customer ON hk = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(14,2)) *
        |     (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))
        |   ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) * 100.0 /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE), 4) AS promo_pct,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q19_brand_quantity" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   CAST(l_discount AS DECIMAL(14,2))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(CAST(sum(l_quantity) AS DOUBLE), 2) > 350.0)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "dedup_blocks" ->
      """WITH blocks AS (
        |  SELECT doc_id,
        |    md5(unnest(list_transform(
        |      range(CAST(ceil(length(text) / 64.0) AS BIGINT)),
        |      i -> substring(text, CAST(i * 64 + 1 AS INT), 64)))) AS h
        |  FROM documents WHERE length(text) > 0),
        |shared AS (
        |  SELECT h FROM blocks GROUP BY h HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(count(*) FILTER (h IN (SELECT h FROM shared)) AS BIGINT)
        |    AS n_shared,
        |  round(count(*) FILTER (h IN (SELECT h FROM shared))
        |    / CAST(count(*) AS DOUBLE), 6) AS shared_ratio
        |FROM blocks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_prune" ->
      """WITH blocks AS (
        |  SELECT doc_id, b.pos, b.block, md5(b.block) AS h
        |  FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i, 'block': substring(text, CAST(i * 64 + 1 AS INT), 64)}
        |              for i in range(CAST(ceil(length(text) / 64.0) AS BIGINT))]) AS b
        |    FROM documents WHERE length(text) > 0)),
        |boiler AS (
        |  SELECT h FROM blocks GROUP BY h HAVING count(DISTINCT doc_id) > 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(count(*) FILTER (h NOT IN (SELECT h FROM boiler)) AS BIGINT)
        |    AS n_kept,
        |  CAST(coalesce(sum(length(block))
        |    FILTER (h NOT IN (SELECT h FROM boiler)), 0) AS BIGINT) AS kept_chars,
        |  md5(string_agg(CASE WHEN h NOT IN (SELECT h FROM boiler)
        |                      THEN block ELSE '' END, '' ORDER BY pos)) AS kept_md5
        |FROM blocks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_winnow" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 'h': md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])}
        |            for i in range(1, len(t) - 1)]) AS s
        |  FROM toks WHERE len(t) >= 3),
        |fps AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id, s.pos // 8 AS blk, min(s.h) AS fp
        |    FROM sh GROUP BY doc_id, blk)),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 30),
        |capped AS (SELECT doc_id, fp FROM fps WHERE fp IN (SELECT fp FROM keep))
        |SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM capped x JOIN capped y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY a, b""".stripMargin,
    "dedup_spans" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(regexp_replace(text, '[ \t\n\f\r\x0B]+', ' ', 'g')) AS n FROM documents),
        |pos AS (
        |  SELECT doc_id, n, unnest(generate_series(1, length(n) - 39, 10)) AS p
        |  FROM norm WHERE length(n) >= 40),
        |spans AS (SELECT doc_id, md5(substr(n, CAST(p AS INT), 40)) AS span_md5 FROM pos)
        |SELECT span_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_hits, CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM spans GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY span_md5""".stripMargin,
    "dedup_span_regions" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(regexp_replace(text, '[ \t\n\f\r\x0B]+', ' ', 'g')) AS n FROM documents),
        |pos AS (
        |  SELECT doc_id, n, unnest(generate_series(1, length(n) - 39, 10)) AS p
        |  FROM norm WHERE length(n) >= 40),
        |spans AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
        |    md5(substr(n, CAST(p AS INT), 40)) AS h FROM pos),
        |dups AS (SELECT h FROM spans GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT s.doc_id, s.p FROM spans s JOIN dups USING (h)),
        |marked AS (
        |  SELECT doc_id, p,
        |    max(p + 40) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hits),
        |flagged AS (
        |  SELECT doc_id, p,
        |    CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END AS new_reg
        |  FROM marked),
        |regs AS (
        |  SELECT doc_id, p,
        |    sum(new_reg) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reg
        |  FROM flagged),
        |regions AS (
        |  SELECT doc_id, reg, min(p) AS rs, max(p + 40) AS re
        |  FROM regs GROUP BY doc_id, reg)
        |SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_regions,
        |  CAST(sum(re - rs) AS BIGINT) AS dup_chars,
        |  CAST(min(length(nm.n)) AS BIGINT) AS doc_chars,
        |  round(sum(re - rs) / CAST(min(length(nm.n)) AS DOUBLE), 6) AS dup_ratio
        |FROM regions r JOIN norm nm USING (doc_id)
        |GROUP BY r.doc_id ORDER BY r.doc_id""".stripMargin,
    "histogram_equidepth" ->
      """WITH e AS (SELECT quantile_cont(l_extendedprice,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM lineitem),
        |t AS (SELECT l_extendedprice AS p,
        |    1 + len(list_filter((SELECT qs FROM e), q -> q < p)) AS b FROM lineitem)
        |SELECT CAST(b AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  round(min(p), 2) AS lo, round(max(p), 2) AS hi
        |FROM t GROUP BY b ORDER BY bucket""".stripMargin,
    // contract oracle (sketch edges are engine-specific): ten buckets,
    // each within ±5% of the fair share — the oracle emits the rows
    // the approximate histogram must reproduce
    "histogram_equidepth_approx" ->
      """SELECT CAST(b AS BIGINT) AS bucket, TRUE AS within_5pct
        |FROM generate_series(1, 10) t(b)
        |ORDER BY bucket""".stripMargin,
    "sketch_cms" ->
      """WITH hexes AS (
        |  SELECT l_suppkey AS k, j,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(md5(
        |          CAST(j AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)), 1, 12), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 256 AS bucket
        |  FROM lineitem CROSS JOIN range(4) t(j)
        |), sketch AS (
        |  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt FROM hexes GROUP BY 1, 2
        |), topk AS (
        |  SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM lineitem GROUP BY 1 ORDER BY exact_cnt DESC, k LIMIT 10
        |), kb AS (
        |  SELECT DISTINCT h.k, h.j, h.bucket FROM hexes h JOIN topk USING (k)
        |), est AS (
        |  SELECT kb.k, min(s.cnt) AS est_cnt FROM kb JOIN sketch s USING (j, bucket)
        |  GROUP BY kb.k)
        |SELECT t.k AS suppkey, t.exact_cnt, e.est_cnt,
        |  e.est_cnt >= t.exact_cnt AS never_under,
        |  e.est_cnt - t.exact_cnt <= 8 * (SELECT count(*) FROM lineitem) / 256 AS bound_ok
        |FROM topk t JOIN est e USING (k)
        |ORDER BY t.exact_cnt DESC, t.k""".stripMargin,
    "stats_moments" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(skewness(l_extendedprice) * (count(*) - 2)
        |    / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew_price,
        |  round(kurtosis_pop(l_extendedprice), 6) AS kurt_price,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "profile_stats" ->
      """SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
        |  SELECT 'l_quantity' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
        |    CAST(min(l_quantity) AS VARCHAR) AS min_val,
        |    CAST(max(l_quantity) AS VARCHAR) AS max_val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |    count(DISTINCT l_shipdate), CAST(min(l_shipdate) AS VARCHAR),
        |    CAST(max(l_shipdate) AS VARCHAR) FROM lineitem
        |) ORDER BY col_name""".stripMargin,
    "skew_profile" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1)
        |SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  min(cnt) AS min_cnt, max(cnt) AS max_cnt
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey AS k, 'U' AS op, o_totalprice + 100.0 AS new_price
        |  FROM base WHERE o_orderkey % 10 = 0 AND o_orderkey % 23 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', NULL FROM base WHERE o_orderkey % 23 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, 'I', 50.0 FROM base WHERE o_orderkey % 17 = 0)
        |SELECT coalesce(o_orderkey, k) AS okey,
        |  coalesce(new_price, o_totalprice) AS price,
        |  CASE WHEN op = 'U' THEN 'updated'
        |       WHEN op = 'I' THEN 'inserted'
        |       ELSE 'base' END AS src
        |FROM base FULL OUTER JOIN changes ON o_orderkey = k
        |WHERE coalesce(op, '') <> 'D'
        |ORDER BY okey""".stripMargin,
    "bloom_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
        |    AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 8000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "mixture_sample" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |JOIN (VALUES ('en','f0000000'),('de','80000000'),('es','80000000'),
        |             ('fr','40000000'),('zh','20000000')) AS rates(r_lang, thresh)
        |  ON lang = r_lang
        |WHERE substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) < thresh
        |ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |         md5('strat:' || CAST(doc_id AS VARCHAR)) AS hh
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hh ASC, doc_id ASC) AS rnk
        |  FROM h)
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id
        |FROM r WHERE rnk <= 50 ORDER BY lang, rnk""".stripMargin,
    "mixture_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS tot FROM c),
        |q AS (SELECT lang, least(n_docs,
        |    CAST(round(150 * sqrt(CAST(n_docs AS DOUBLE)) / (SELECT tot FROM t), 0)
        |      AS BIGINT)) AS quota FROM c),
        |h AS (SELECT lang, doc_id,
        |    md5('temp:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents),
        |r AS (SELECT h.lang, h.doc_id, q.quota,
        |    row_number() OVER (PARTITION BY h.lang ORDER BY h.hh ASC, h.doc_id ASC) AS rnk
        |  FROM h JOIN q USING (lang))
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, quota
        |FROM r WHERE rnk <= quota ORDER BY lang, rnk""".stripMargin,
    "weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
        |         md5('ws:' || CAST(doc_id AS VARCHAR)) AS hex
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, source, w,
        |    list_sum([CAST(strpos('0123456789abcdef', substr(hex, i, 1)) - 1
        |                   AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (13 - i)))
        |              for i in range(1, 14)]) AS hv
        |  FROM h),
        |k AS (
        |  SELECT doc_id, source,
        |         round(ln((CAST(hv AS DOUBLE) + 0.5) / 4503599627370496.0) / w,
        |               12) AS skey
        |  FROM v),
        |r AS (SELECT doc_id, source, skey,
        |    row_number() OVER (ORDER BY skey DESC, doc_id) AS rnk FROM k)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, source, skey
        |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    // ε-DP Laplace release: derandomized via the weighted_sample
    // 13-hex-char uniform (v+0.5)/2^52, inverse-CDF noise, released
    // values rounded to 6 (the ln-ulp discipline)
    "dp_release" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_docs,
        |        CAST(sum(least(n_tok, 100)) AS BIGINT) AS true_toks
        |      FROM d GROUP BY lang),
        |u AS (
        |  SELECT lang, true_docs, true_toks,
        |    list_sum([CAST(strpos('0123456789abcdef',
        |        substr(md5('REPLAY-FIXTURE-SEED:dpd:' || lang), i, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4 * (13 - i))) for i in range(1, 14)]) AS vd,
        |    list_sum([CAST(strpos('0123456789abcdef',
        |        substr(md5('REPLAY-FIXTURE-SEED:dpt:' || lang), i, 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << (4 * (13 - i))) for i in range(1, 14)]) AS vt
        |  FROM a),
        |n AS (
        |  SELECT lang, true_docs, true_toks,
        |    (CAST(vd AS DOUBLE) + 0.5) / 4503599627370496.0 - 0.5 AS cd,
        |    (CAST(vt AS DOUBLE) + 0.5) / 4503599627370496.0 - 0.5 AS ct
        |  FROM u)
        |SELECT lang, CAST(1.0 AS DOUBLE) AS epsilon,
        |  round(true_docs + (-sign(cd)) * 1.0 * ln(1.0 - 2.0 * abs(cd)), 6)
        |    AS noisy_docs,
        |  round(true_toks + (-sign(ct)) * 100.0 * ln(1.0 - 2.0 * abs(ct)), 6)
        |    AS noisy_toks
        |FROM n ORDER BY lang""".stripMargin,
    // data card: volume + language spread + exact-dup load + short
    // share per source; dominant lang tie-broken lexicographically
    // via the same struct-max trick both engines order identically
    "source_datacard" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang, n_chars,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok,
        |    md5(text) AS digest
        |  FROM documents),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS dup_docs,
        |    CAST(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_short
        |  FROM d GROUP BY 1),
        |l AS (
        |  SELECT source, lang, count(*) AS n FROM d GROUP BY 1, 2),
        |langs AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |    max({'n': n, 'lang': lang}).lang AS top_lang
        |  FROM l GROUP BY 1)
        |SELECT base.source, n_docs, total_tokens, total_chars, dup_docs,
        |  n_langs, top_lang, n_short
        |FROM base JOIN langs ON base.source = langs.source
        |ORDER BY base.source""".stripMargin,
    // snapshot diff: full-outer on doc_id, digest compare for
    // changed-vs-unchanged, per-(source, status) rollup
    "corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 20 = 0 THEN 'v1:' || text ELSE text END) AS d1
        |  FROM documents WHERE doc_id % 30 <> 0),
        |v2 AS (
        |  SELECT doc_id, source, md5(text) AS d2
        |  FROM documents WHERE doc_id % 30 <> 7),
        |j AS (
        |  SELECT coalesce(v1.source, v2.source) AS source,
        |    CASE WHEN d1 IS NULL THEN 'added'
        |         WHEN d2 IS NULL THEN 'removed'
        |         WHEN d1 <> d2 THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin,
    // DSIR: per-occurrence md5 bucket, collapsed to a (doc, bucket)
    // histogram (the r12 shape — mirrors the Spark side exactly),
    // smoothed target/raw log-ratio per bucket, occurrence-weighted
    // mean per doc (rounded BEFORE the Gumbel add), Gumbel top-k
    // with the md5 13-hex uniform — replays the whole importance-
    // resampling pipeline including the noise draw
    "dsir_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, unnest(ts ||
        |      list_transform(generate_series(1, len(ts) - 1),
        |        i -> ts[i] || ' ' || ts[i+1])) AS gram
        |  FROM d),
        |b AS (
        |  SELECT doc_id, source,
        |    list_sum([CAST(strpos('0123456789abcdef',
        |        substr(md5('dsir:' || gram), i, 1)) - 1
        |                   AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (13 - i)))
        |              for i in range(1, 14)]) % 256 AS bucket
        |  FROM g),
        |db AS (SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS n
        |       FROM b GROUP BY 1, 2, 3),
        |counts AS (
        |  SELECT bucket,
        |    sum(CASE WHEN source = 'src0' THEN n ELSE 0 END) AS ct,
        |    sum(CASE WHEN source <> 'src0' THEN n ELSE 0 END) AS cr
        |  FROM db GROUP BY 1),
        |tot AS (SELECT sum(ct) AS tt_all, sum(cr) AS tr_all FROM counts),
        |w AS (SELECT db.doc_id, min(db.source) AS source,
        |    round(sum((ln((CAST(counts.ct AS DOUBLE) + 0.5) /
        |                  (CAST(tot.tt_all AS DOUBLE) + 0.5 * 256)) -
        |               ln((CAST(counts.cr AS DOUBLE) + 0.5) /
        |                  (CAST(tot.tr_all AS DOUBLE) + 0.5 * 256))) * db.n)
        |      / sum(db.n), 6) AS w
        |  FROM db JOIN counts USING (bucket), tot
        |  WHERE db.source <> 'src0' GROUP BY 1),
        |uh AS (SELECT doc_id, source, w,
        |    md5('dsir:' || CAST(doc_id AS VARCHAR)) AS hex FROM w),
        |k AS (
        |  SELECT doc_id, source,
        |    round(w - ln(-ln((CAST(list_sum(
        |      [CAST(strpos('0123456789abcdef', substr(hex, i, 1)) - 1
        |            AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (13 - i)))
        |       for i in range(1, 14)]) AS DOUBLE) + 0.5)
        |        / 4503599627370496.0)), 12) AS dkey
        |  FROM uh),
        |r AS (SELECT doc_id, source, dkey,
        |    row_number() OVER (ORDER BY dkey DESC, doc_id) AS rnk FROM k)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, source, dkey
        |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    // CCNet perplexity terciles: lm_score's scoring pipeline, then
    // per-lang ntile(3) over the ROUNDED score (total order with
    // doc_id tie-break, so the bucket boundaries replay exactly)
    "ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x <> '')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab),
        |scored AS (
        |  SELECT doc_id, lang,
        |         round(avg(ln(cnt / CAST(total AS DOUBLE))), 6) AS lm_score
        |  FROM tok JOIN vocab USING (tok), tot
        |  GROUP BY doc_id, lang),
        |t AS (SELECT doc_id, lang, lm_score,
        |    ntile(3) OVER (PARTITION BY lang
        |                   ORDER BY lm_score DESC, doc_id) AS tile
        |  FROM scored)
        |SELECT doc_id, lang, lm_score,
        |  CASE WHEN tile = 1 THEN 'head'
        |       WHEN tile = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM t ORDER BY doc_id""".stripMargin,
    // the capstone funnel: gate → exact-dedup keep-lowest → train
    // split → shard → per-shard manifest, each stage the established
    // oracle-replayable rule
    "train_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |gated AS (SELECT * FROM toks WHERE n_tok >= 20),
        |kept AS (
        |  SELECT min(doc_id) AS doc_id, arg_min(n_tok, doc_id) AS n_tok
        |  FROM gated GROUP BY md5(text)),
        |tr AS (
        |  SELECT doc_id, n_tok FROM kept
        |  WHERE substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'),
        |sh AS (
        |  SELECT doc_id, n_tok,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(
        |        md5('shuffle:ep1:' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 16 AS shard
        |  FROM tr)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc,
        |  CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM sh GROUP BY 1 ORDER BY shard""".stripMargin,
    // seeded md5 shuffle key → top-32-bit shard → rank within shard:
    // the whole permutation replays from the seed string alone
    "train_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    md5('shuffle:ep1:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, k,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(k, 1, 8), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 16 AS shard
        |  FROM h)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1
        |    AS BIGINT) AS pos,
        |  doc_id, source
        |FROM s ORDER BY shard, pos""".stripMargin,
    "colloc_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest([{'a': t[i], 'b': t[i+1]} for i in range(1, len(t))]) AS s
        |  FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT s.a AS w1, s.b AS w2, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY 1, 2),
        |uc AS (SELECT tok, count(*) AS c1
        |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        |n AS (SELECT sum(cnt) AS total FROM bc)
        |SELECT w1, w2, cnt,
        |  round(ln(cnt * (SELECT total FROM n) /
        |           (ua.c1 * CAST(ub.c1 AS DOUBLE))), 6) AS pmi
        |FROM bc JOIN uc ua ON bc.w1 = ua.tok JOIN uc ub ON bc.w2 = ub.tok
        |WHERE cnt >= 5 ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest([{'a': t[i], 'b': t[i+1]} for i in range(1, len(t))]) AS s
        |  FROM toks WHERE len(t) >= 2),
        |c AS (SELECT s.a AS w1, s.b AS w2, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY 1, 2),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT w1, w2, cnt FROM c
        |WHERE cnt > (SELECT total FROM t) * 0.0012
        |ORDER BY cnt DESC, w1, w2""".stripMargin,
    "mask_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 'tok': t[i]} for i in range(1, len(t) + 1)]) AS s
        |  FROM toks),
        |f AS (
        |  SELECT doc_id, s.pos AS pos, s.tok AS tok,
        |    substr(md5('mask:' || CAST(doc_id AS VARCHAR) || ':' ||
        |               CAST(s.pos AS VARCHAR)), 1, 1) IN ('0', '1') AS flag
        |  FROM tok),
        |r AS (
        |  SELECT *, flag AND NOT coalesce(
        |      lag(flag) OVER (PARTITION BY doc_id ORDER BY pos), false) AS run_start
        |  FROM f),
        |s AS (
        |  SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS sid
        |  FROM r)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (flag) AS BIGINT) AS n_masked,
        |  coalesce(string_agg(
        |    CASE WHEN NOT flag THEN tok
        |         WHEN run_start THEN '<extra_id_' || sid || '>' END,
        |    ' ' ORDER BY pos) FILTER (NOT flag OR run_start), '') AS input_text,
        |  coalesce(string_agg(
        |    CASE WHEN run_start THEN '<extra_id_' || sid || '> ' || tok
        |         ELSE tok END,
        |    ' ' ORDER BY pos) FILTER (flag), '') AS target_text
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x <> '')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |       round(avg(ln(cnt / CAST(total AS DOUBLE))), 6) AS lm_score
        |FROM tok JOIN vocab USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram occurrences rebuilt as 'prev tok' strings (ws tokens
    // cannot contain spaces, so the join/split round-trip is exact)
    "lm_score2" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\s+'),
        |                     t -> t <> '') AS ts
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ts) AS tok FROM d),
        |uni AS (SELECT tok, count(*) AS cu FROM tok GROUP BY 1),
        |tot AS (SELECT sum(cu) AS total FROM uni),
        |occ0 AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(ts) - 1),
        |                i -> ts[i] || ' ' || ts[i+1])) AS bg
        |  FROM d WHERE len(ts) >= 2),
        |occ AS (SELECT doc_id, string_split(bg, ' ')[1] AS prev,
        |               string_split(bg, ' ')[2] AS tok FROM occ0),
        |bc AS (SELECT prev, tok, count(*) AS cb FROM occ GROUP BY 1, 2)
        |SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_big,
        |       round(avg(ln(0.7 * (cb / CAST(up.cu AS DOUBLE))
        |                  + 0.3 * (ut.cu / CAST(total AS DOUBLE)))), 6) AS lm2
        |FROM occ JOIN bc USING (prev, tok)
        |JOIN uni up ON up.tok = occ.prev
        |JOIN uni ut ON ut.tok = occ.tok, tot
        |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin,
    "emb_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(scale, 6) AS scale,
        |  round(list_sum(list_transform(embedding,
        |    x -> pow(CAST(x AS DOUBLE)
        |         - round(CAST(x AS DOUBLE) / scale) * scale, 2)))
        |    / len(embedding), 6) AS mse,
        |  CAST(len(list_filter(embedding,
        |    x -> round(abs(CAST(x AS DOUBLE)) / scale) = 0)) AS BIGINT) AS n_zero
        |FROM s WHERE scale > 0
        |ORDER BY vec_id""".stripMargin,
    // Morton interleave replayed as the same shift/mask sum over the
    // min/max-normalized 8-bit buckets
    "layout_zorder" ->
      """WITH d AS (
        |  SELECT o_orderkey, o_custkey AS x,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS yday
        |  FROM orders),
        |s AS (SELECT min(x) xmn, max(x) xmx, min(yday) ymn, max(yday) ymx
        |      FROM d),
        |b AS (
        |  SELECT o_orderkey, x, yday,
        |    CAST(floor(((x - xmn) * 256) / (xmx - xmn + 1.0)) AS BIGINT) AS xb,
        |    CAST(floor(((yday - ymn) * 256) / (ymx - ymn + 1.0)) AS BIGINT) AS yb
        |  FROM d, s)
        |SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(yday AS BIGINT) AS yday,
        |  CAST(sum((((xb >> j) & 1) << (2 * j)) +
        |           (((yb >> j) & 1) << (2 * j + 1))) AS BIGINT) AS zkey
        |FROM b, generate_series(0, 7) t(j)
        |GROUP BY o_orderkey, x, yday
        |ORDER BY o_orderkey""".stripMargin,
    // sign matrix = md5 parity, recomputed independently by DuckDB;
    // ×1024 quantization makes every projected coordinate an exact
    // integer both engines agree on
    "emb_rp" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, j, qv[j + 1] AS val
        |  FROM q, generate_series(0, 63) t(j)),
        |s AS (
        |  SELECT i, j, CASE WHEN substr(md5('rp:' || i || ':' || j), 1, 1)
        |    BETWEEN '0' AND '7' THEN 1 ELSE -1 END AS sg
        |  FROM generate_series(0, 31) a(i), generate_series(0, 63) b(j))
        |SELECT u.vec_id, CAST(s.i AS BIGINT) AS dim,
        |  CAST(sum(u.val * s.sg) AS BIGINT) AS p
        |FROM u JOIN s USING (j)
        |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,
    "q2_min_cost" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |         min(l_extendedprice / l_quantity) AS unit_price
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1,2,3,4,5,6
        |), minp AS (
        |  SELECT p_partkey AS mk, min(unit_price) AS min_price
        |  FROM offers GROUP BY 1
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |       round(unit_price, 6) AS unit_price
        |FROM offers JOIN minp ON p_partkey = mk AND unit_price = min_price
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |        THEN CAST(l_extendedprice AS DECIMAL(14,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(14,2))) ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE), 6)
        |    AS mkt_share
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(14,2))) -
        |      CAST(p_retailprice AS DECIMAL(14,2)) * CAST('0.1' AS DECIMAL(4,2)) *
        |      CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1,2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important" ->
      """WITH vals AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  GROUP BY 1
        |), tot AS (SELECT sum(value) AS total FROM vals)
        |SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
        |FROM vals, tot WHERE value * 1000 > total
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_size IN (1,5,9,13,17,21,25,29)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1,2,3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'blue%'
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1,2
        |), per_part AS (
        |  SELECT l_partkey AS pk, sum(pair_qty) AS part_qty
        |  FROM shipped GROUP BY 1
        |)
        |SELECT s_name, s_acctbal FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM shipped
        |  JOIN per_part ON l_partkey = pk AND pair_qty * 2 > part_qty)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting" ->
      """WITH lines AS (
        |  SELECT l_orderkey, l_suppkey,
        |         bool_or(l_shipdate > o_orderdate + INTERVAL 45 DAY) AS late
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |  GROUP BY 1,2
        |), l1 AS (SELECT l_orderkey, l_suppkey FROM lines WHERE late)
        |SELECT s_name, n_name, count(*) AS numwait
        |FROM l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM lines o
        |        WHERE o.l_orderkey = l1.l_orderkey
        |          AND o.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lines o
        |        WHERE o.l_orderkey = l1.l_orderkey
        |          AND o.l_suppkey <> l1.l_suppkey AND o.late)
        |GROUP BY 1,2
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q12_late_mix" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders
        |   ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        | GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty" ->
      """WITH agg AS (SELECT l_partkey AS pk, sum(l_quantity) AS sum_q, count(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey JOIN agg ON l_partkey = pk
        |WHERE p_brand = 'Brand#13' AND p_size < 5
        |  AND l_quantity * 5 * cnt < sum_q""".stripMargin,
    "q22_idle_balance" ->
      """WITH pos AS (SELECT sum(CAST(c_acctbal AS DECIMAL(14,2))) AS s, count(*) AS n
        |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(14,2)) > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(14,2)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_interval" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        | b.us - a.us AS delta_us
        |FROM ev a JOIN ev b ON a.user_id = b.user_id
        | AND b.us > a.us AND b.us - a.us <= 300000000
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin,
    "win_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lag" ->
      """SELECT o_custkey, o_orderkey,
        | round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 0.0), 2) AS delta_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "rollup_qty" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,
    "cube_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "ts_m4" ->
      """WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS t, event_id FROM events),
        |k AS (SELECT *, strftime(t, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
        |         lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey FROM e)
        |SELECT event_type,
        |  strftime(date_trunc('hour', t), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS n,
        |  round(min(value), 3) AS min_v, round(max(value), 3) AS max_v,
        |  round(arg_min(value, okey), 3) AS first_v,
        |  round(arg_max(value, okey), 3) AS last_v
        |FROM k GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "ts_hourly" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type, count(*) AS n, round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // the streaming contracts: Spark runs the real streaming job and
    // emits booleans; the oracle pins them TRUE — the row only hashes
    // green if the streaming twin matched its batch operator
    "stream_window_contract" ->
      """SELECT 'window_rows_match' AS metric, TRUE AS ok
        |UNION ALL SELECT 'window_set_equal', TRUE
        |ORDER BY metric""".stripMargin,
    "stream_dedup_contract" ->
      """SELECT 'dedup_digest_set_equal' AS metric, TRUE AS ok
        |UNION ALL SELECT 'dedup_rows_match', TRUE
        |ORDER BY metric""".stripMargin,
    "stream_join_contract" ->
      """SELECT 'join_rows_match' AS metric, TRUE AS ok
        |UNION ALL SELECT 'join_set_equal', TRUE
        |ORDER BY metric""".stripMargin,
    "stream_neardup_contract" ->
      """SELECT 'neardup_pair_set_equal' AS metric, TRUE AS ok
        |UNION ALL SELECT 'neardup_rows_match', TRUE
        |ORDER BY metric""".stripMargin,
    // streaming index ingest: a real foreachBatch job mutates the
    // at-rest near-dup index per micro-batch (gate → admit survivors
    // → batch watermark in the same swing); end state == the
    // deterministic batch replay, replayed batches are no-ops
    "stream_index_ingest" ->
      """SELECT unnest([
        |  'ingest_batch_counts_match', 'ingest_gate_rejected',
        |  'ingest_one_commit_per_batch', 'ingest_replay_is_noop',
        |  'ingest_stream_matches_batch']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // distributed PCA contract: the exact-integer second-moment SUMS
    // (same ×1024 quantization as the emb family) replay in DuckDB —
    // Σ_d Σx² and Σ_d Σx are n-scaled exact BIGINTs (the earlier
    // n²-scaled trace numerator overflows around 10⁶ rows) — and the
    // eigen-side invariants (PSD spectrum, orthonormal components,
    // top-k share ≥ k/d which a DESC-sorted spectrum guarantees when
    // trace > 0, projected variance reproducing the eigenvalues in a
    // second distributed pass) are pinned TRUE. The WHERE n>0 guard
    // (r11 ADVICE) makes the oracle 0-row on an empty corpus — the
    // literal UNION ALL branches would otherwise emit rows where the
    // Spark side returns none
    "emb_pca" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |s AS (SELECT sum(vq[i]) AS sx, sum(vq[i] * vq[i]) AS sxx
        |      FROM q, generate_series(1, 64) t(i)),
        |nn AS (SELECT count(*) AS n FROM q)
        |SELECT metric, value, ok FROM (
        |  SELECT 'n_vectors' AS metric, CAST(n AS BIGINT) AS value,
        |         TRUE AS ok FROM nn
        |  UNION ALL SELECT 'dim', 64, TRUE
        |  UNION ALL SELECT 'k_components', 8, TRUE
        |  UNION ALL SELECT 'sumsq_total', CAST(sxx AS BIGINT), TRUE FROM s
        |  UNION ALL SELECT 'sum_total', CAST(sx AS BIGINT), TRUE FROM s
        |  UNION ALL SELECT 'eigvals_nonneg', 0, TRUE
        |  UNION ALL SELECT 'components_orthonormal', 0, TRUE
        |  UNION ALL SELECT 'explained_ge_uniform_share', 0, TRUE
        |  UNION ALL SELECT 'proj_var_matches_eigvals', 0, TRUE
        |) WHERE (SELECT n FROM nn) > 0 ORDER BY metric""".stripMargin,
    // softmax domain-classifier contract: exact per-label counts
    // replay in DuckDB; the training invariants (loss below the
    // zero-weight chance loss ln C, accuracy over both the 15% floor
    // and the majority rate, finite weights) are pinned TRUE
    "domain_classifier" ->
      """WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt
        |           FROM embeddings GROUP BY label),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nv,
        |             CAST(count(DISTINCT label) AS BIGINT) AS ncls
        |      FROM embeddings)
        |SELECT metric, value, ok FROM (
        |  SELECT 'n_vectors' AS metric, nv AS value, TRUE AS ok FROM n
        |  UNION ALL SELECT 'n_classes', ncls, TRUE FROM n
        |  UNION ALL SELECT 'n_label_' || CAST(label AS VARCHAR), cnt, TRUE FROM c
        |  UNION ALL SELECT 'loss_below_chance', 0, TRUE
        |  UNION ALL SELECT 'accuracy_ge_15pct', 0, TRUE
        |  UNION ALL SELECT 'accuracy_beats_majority', 0, TRUE
        |  UNION ALL SELECT 'weights_finite', 0, TRUE
        |) WHERE (SELECT nv FROM n) > 0 ORDER BY metric""".stripMargin,
    // semantic decontamination: exact-integer cosines against the
    // broadcast eval set, per-vector argmax (ties to smallest eval
    // id), >= tau decided on the RAW exact similarity
    "contamination_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, vq AS evv FROM e WHERE vec_id < 20),
        |s AS (
        |  SELECT c.vec_id, ev.eval_id,
        |    list_inner_product(c.vq, ev.evv) /
        |      (sqrt(list_inner_product(c.vq, c.vq)) *
        |       sqrt(list_inner_product(ev.evv, ev.evv))) AS sim
        |  FROM e c, ev WHERE c.vec_id >= 20),
        |m AS (SELECT vec_id, eval_id, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, eval_id ASC) AS rn FROM s) WHERE rn = 1)
        |SELECT vec_id, eval_id, round(sim, 6) AS max_sim,
        |       sim >= 0.8 AS contaminated
        |FROM m ORDER BY vec_id""".stripMargin,
    "ts_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT *, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts FROM e),
        |g AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |   THEN 1 ELSE 0 END AS new_sess FROM f),
        |h AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end
        |FROM h GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "ts_asof" ->
      """WITH t AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |  CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END AS signup_ts FROM events),
        |u AS (SELECT *, last_value(signup_ts IGNORE NULLS) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
        | FROM t)
        |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
        | strftime(last_signup, '%Y-%m-%d %H:%M:%S') AS signup_at
        |FROM u WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin,
    "ts_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |         round(CAST(sum(value) AS DOUBLE), 3) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
        |joined AS (SELECT g.event_type, g.h, hr.v
        |  FROM grid g LEFT JOIN hourly hr USING (event_type, h)),
        |marked AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER w AS prev_v,
        |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w AS prev_h,
        |    first_value(v IGNORE NULLS) OVER w2 AS next_v,
        |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w2 AS next_h
        |  FROM joined
        |  WINDOW w  AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         w2 AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS filled,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    ELSE prev_v + (next_v - prev_v) *
        |      (CAST(date_diff('second', prev_h, h) AS DOUBLE) /
        |       CAST(date_diff('second', prev_h, next_h) AS DOUBLE)) END, 3) AS v_filled
        |FROM marked ORDER BY event_type, hour_start""".stripMargin,
    "ts_asof_nearest" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT *, CASE WHEN event_type = 'click' THEN ts END AS click_ts FROM e),
        |w AS (
        |  SELECT *,
        |    last_value(click_ts IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click,
        |    first_value(click_ts IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click
        |  FROM m),
        |p AS (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(ts) - epoch_us(prev_click) AS dp,
        |    epoch_us(next_click) - epoch_us(ts) AS dn,
        |    prev_click, next_click
        |  FROM w WHERE event_type = 'purchase')
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
        |  strftime(CASE WHEN dp IS NOT NULL AND (dn IS NULL OR dp <= dn)
        |    THEN prev_click ELSE next_click END, '%Y-%m-%d %H:%M:%S') AS nearest_click,
        |  CAST(least(coalesce(dp, dn), coalesce(dn, dp)) // 1000000 AS BIGINT) AS gap_s
        |FROM p
        |WHERE least(coalesce(dp, dn), coalesce(dn, dp)) IS NOT NULL
        |  AND least(coalesce(dp, dn), coalesce(dn, dp)) <= 900000000
        |ORDER BY user_id, event_id""".stripMargin,
    "ts_session_window" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
        |g AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM f),
        |h AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS sess_end
        |FROM h GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,
    "retention_cohorts" ->
      """WITH e AS (SELECT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS w FROM events),
        |first AS (SELECT user_id, min(w) AS cohort_w FROM e GROUP BY 1),
        |size_ AS (SELECT cohort_w, count(*) AS cohort_n FROM first GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT f.cohort_w,
        |    CAST(date_diff('day', f.cohort_w, e.w) // 7 AS BIGINT) AS offset_w,
        |    e.user_id
        |  FROM e JOIN first f USING (user_id)),
        |ret AS (SELECT cohort_w, offset_w, CAST(count(*) AS BIGINT) AS n_users
        |  FROM act GROUP BY 1, 2)
        |SELECT strftime(r.cohort_w, '%Y-%m-%d') AS cohort_week, r.offset_w,
        |  r.n_users, CAST(s.cohort_n AS BIGINT) AS cohort_n,
        |  round(r.n_users / CAST(s.cohort_n AS DOUBLE), 6) AS retention
        |FROM ret r JOIN size_ s USING (cohort_w)
        |ORDER BY cohort_week, offset_w""".stripMargin,
    "ts_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |         round(CAST(sum(value) AS DOUBLE), 3) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, h, v,
        |    round(avg(v) OVER win, 6) AS mu,
        |    round(stddev_samp(v) OVER win, 6) AS sd,
        |    count(*) OVER win AS nw
        |  FROM hourly
        |  WINDOW win AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start, v,
        |  round((v - mu) / sd, 4) AS zscore,
        |  abs(round((v - mu) / sd, 4)) > 2.5 AS is_anomaly
        |FROM w WHERE nw >= 12 AND sd > 0
        |ORDER BY event_type, hour_start""".stripMargin,
    "graph_triangles" ->
      """WITH items0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |freq AS (SELECT pk, count(*) AS cnt FROM items0 GROUP BY 1),
        |capped AS (
        |  SELECT i.ok, i.pk,
        |    row_number() OVER (PARTITION BY i.ok ORDER BY i.pk) AS rn
        |  FROM items0 i JOIN freq f USING (pk) WHERE f.cnt >= 5),
        |items AS (SELECT ok, pk FROM capped WHERE rn <= 30),
        |pairs0 AS (
        |  SELECT a.pk AS pa, b.pk AS pb
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
        |e AS (SELECT pa, pb FROM pairs0 GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT u, count(*) AS d FROM (
        |  SELECT pa AS u FROM e UNION ALL SELECT pb FROM e) GROUP BY 1),
        |tri AS (SELECT count(*) AS t FROM e e1
        |  JOIN e e2 ON e2.pa = e1.pb
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |w AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg)
        |SELECT w.n_nodes, tot.n_edges, w.n_wedges,
        |  CAST(tri.t AS BIGINT) AS n_triangles,
        |  round(3.0 * tri.t / w.n_wedges, 6) AS clustering
        |FROM tri, tot, w""".stripMargin,
    "assoc_pairs" ->
      """WITH items0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |freq AS (SELECT pk, count(*) AS cnt FROM items0 GROUP BY 1),
        |capped AS (
        |  SELECT i.ok, i.pk, f.cnt,
        |    row_number() OVER (PARTITION BY i.ok ORDER BY i.pk) AS rn
        |  FROM items0 i JOIN freq f USING (pk) WHERE f.cnt >= 5),
        |items AS (SELECT ok, pk, cnt FROM capped WHERE rn <= 30),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, a.cnt AS cnt_a, b.cnt AS cnt_b
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS pair_cnt,
        |  CAST(min(cnt_a) AS BIGINT) AS cnt_a, CAST(min(cnt_b) AS BIGINT) AS cnt_b,
        |  round(count(*) / CAST(min(cnt_a) AS DOUBLE), 4) AS conf_a_b
        |FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY part_a, part_b""".stripMargin,
    "graph_pagerank" ->
      """WITH items0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |freq AS (SELECT pk, count(*) AS cnt FROM items0 GROUP BY 1),
        |capped AS (
        |  SELECT i.ok, i.pk,
        |    row_number() OVER (PARTITION BY i.ok ORDER BY i.pk) AS rn
        |  FROM items0 i JOIN freq f USING (pk) WHERE f.cnt >= 5),
        |items AS (SELECT ok, pk FROM capped WHERE rn <= 30),
        |pairs AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
        |deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        |r0 AS (SELECT u, 1.0 / (SELECT n FROM nn) AS r FROM deg),
        |r1 AS (SELECT t.u, round(0.15 / (SELECT n FROM nn)
        |    + 0.85 * coalesce(sum(s.r / sd.d), 0), 12) AS r
        |  FROM deg t LEFT JOIN edges e ON e.v = t.u
        |  LEFT JOIN deg sd ON sd.u = e.u LEFT JOIN r0 s ON s.u = e.u
        |  GROUP BY t.u),
        |r2 AS (SELECT t.u, round(0.15 / (SELECT n FROM nn)
        |    + 0.85 * coalesce(sum(s.r / sd.d), 0), 12) AS r
        |  FROM deg t LEFT JOIN edges e ON e.v = t.u
        |  LEFT JOIN deg sd ON sd.u = e.u LEFT JOIN r1 s ON s.u = e.u
        |  GROUP BY t.u),
        |r3 AS (SELECT t.u, round(0.15 / (SELECT n FROM nn)
        |    + 0.85 * coalesce(sum(s.r / sd.d), 0), 12) AS r
        |  FROM deg t LEFT JOIN edges e ON e.v = t.u
        |  LEFT JOIN deg sd ON sd.u = e.u LEFT JOIN r2 s ON s.u = e.u
        |  GROUP BY t.u)
        |SELECT u AS part, round(r * 1000, 6) AS rank_x1000
        |FROM r3 ORDER BY part""".stripMargin,
    "event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id),
        |c AS (
        |  SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
        |  CAST(n AS BIGINT) AS n_users,
        |  round(n / CAST(coalesce(lag(n, 1) OVER (ORDER BY stage_idx), n)
        |    AS DOUBLE), 6) AS conv_rate
        |FROM c ORDER BY stage_idx""".stripMargin,
    "text_langstats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | round(avg(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        | CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        | round(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
        | round(length(regexp_replace(text, '[^ ]', '', 'g')) / CAST(length(text) AS DOUBLE), 6) AS space_ratio,
        | round(length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE), 6) AS upper_ratio,
        | round((length(text) - length(regexp_replace(text, '[^ ]', '', 'g'))) /
        |   CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE), 6) AS avg_token_len,
        | round(len(list_filter(list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
        |     x -> list_contains(['the','a','of','and','is','to'], x))) /
        |   CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE), 6) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT source,
        | CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS total_ws_tokens,
        | CAST(sum(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> ''))
        |   + length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))) AS BIGINT) AS total_bpeish_tokens,
        | count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and'], x))) AS score_en,
        |  len(list_filter(toks, x -> list_contains(['le','la','et','de'], x))) AS score_fr,
        |  len(list_filter(toks, x -> list_contains(['el','la','y','de'], x))) AS score_es
        | FROM t)
        |SELECT doc_id, CAST(score_en AS BIGINT) AS score_en, CAST(score_fr AS BIGINT) AS score_fr,
        | CAST(score_es AS BIGINT) AS score_es,
        | CASE WHEN score_en >= score_fr AND score_en >= score_es THEN 'en'
        |      WHEN score_fr >= score_es THEN 'fr' ELSE 'es' END AS guess
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_langid_ngram" ->
      """WITH s AS (SELECT doc_id, lower(text) AS t FROM documents)
        |SELECT doc_id,
        | CAST((length(t) - length(replace(t, 'the', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'and', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'ing', ''))) / 3 AS BIGINT) AS score_en,
        | CAST((length(t) - length(replace(t, 'sch', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'der', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'und', ''))) / 3 AS BIGINT) AS score_de,
        | CAST((length(t) - length(replace(t, 'que', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'los', ''))) / 3 AS BIGINT)
        |  + CAST((length(t) - length(replace(t, 'ent', ''))) / 3 AS BIGINT) AS score_es,
        | CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
        |      WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS guess
        |FROM s ORDER BY doc_id""".stripMargin,
    "fuzzy_name_match" ->
      """SELECT p.c_custkey AS probe_id, m.c_custkey AS match_id,
        | CAST(levenshtein(p.c_name, m.c_name) AS BIGINT) AS dist
        |FROM customer p JOIN customer m ON p.c_custkey < 50 AND p.c_custkey <> m.c_custkey
        |WHERE levenshtein(p.c_name, m.c_name) <= 2
        |ORDER BY probe_id, match_id""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |g AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS gram
        |  FROM toks WHERE len(t) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams, count(*) AS n_distinct,
        | round(1.0 - count(*) / CAST(sum(n) AS DOUBLE), 6) AS dup_ratio,
        | round(max(n) / CAST(sum(n) AS DOUBLE), 6) AS top_gram_share
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_vocab" ->
      """WITH tok AS (SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS n FROM tok GROUP BY source, tok)
        |SELECT source, count(*) AS n_types, CAST(sum(n) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        | round(count(*) / CAST(sum(n) AS DOUBLE), 6) AS type_token_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "pii_scan" ->
      """SELECT c_custkey,
        | CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_digit_runs,
        | CAST(coalesce(list_max(list_transform(regexp_extract_all(c_name, '[0-9]+'),
        |   x -> length(x))), 0) AS BIGINT) AS longest_run,
        | regexp_replace(c_name, '[0-9]', '*', 'g') AS redacted,
        | regexp_replace(substr(c_name, 1, length(c_name) - 4), '[0-9]', '*', 'g')
        |   || right(c_name, 4) AS masked_keep4
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // split assignment is a pure function of md5 hex — DuckDB
    // recomputes the identical train/val/test decision per doc
    "sample_split" ->
      """WITH s AS (SELECT source,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tok,
        |  CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |       WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |       ELSE 'test' END AS split
        | FROM documents)
        |SELECT source, split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin,
    "contamination" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT * FROM sh WHERE doc_id >= 20),
        |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        |ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus JOIN bench USING (shingle) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_overlap,
        | round(n_overlap / CAST(n_shingles AS DOUBLE), 6) AS overlap_ratio
        |FROM sizes JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin,
    // identical result to "contamination" by design: the Bloom
    // prefilter is FP-tolerant (exact verify join), so the same SQL
    // is the oracle for both physical shapes
    "contamination_bloom" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT * FROM sh WHERE doc_id >= 20),
        |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        |ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus JOIN bench USING (shingle) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_overlap,
        | round(n_overlap / CAST(n_shingles AS DOUBLE), 6) AS overlap_ratio
        |FROM sizes JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin,
    "split_leak_free" ->
      """WITH g AS (SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS rep
        | FROM documents)
        |SELECT doc_id, rep,
        |  CASE WHEN substr(md5('split:' || CAST(rep AS VARCHAR)), 1, 1) <= 'b'
        |         THEN 'train'
        |       WHEN substr(md5('split:' || CAST(rep AS VARCHAR)), 1, 1) <= 'd'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM g ORDER BY doc_id""".stripMargin,
    "cross_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        | FROM documents)
        |SELECT f.doc_id, f.fp FROM fp f
        |WHERE f.doc_id >= 50
        |  AND f.fp NOT IN (SELECT fp FROM fp WHERE doc_id < 50)
        |ORDER BY f.doc_id""".stripMargin,
    "quality_gate" ->
      """WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS median_chars
        |  FROM documents GROUP BY source)
        |SELECT d.source, m.median_chars,
        | CAST(sum(CASE WHEN d.n_chars > m.median_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | count(*) AS n_total
        |FROM documents d JOIN med m ON d.source = m.source
        |GROUP BY d.source, m.median_chars ORDER BY d.source""".stripMargin,
    "curate_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, n_chars,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS n_toks
        |  FROM documents),
        |gated AS (SELECT * FROM d WHERE n_chars >= 80 AND n_toks >= 20),
        |kept AS (
        |  SELECT arg_min(source, doc_id) AS source,
        |         arg_min(n_toks, doc_id) AS n_toks
        |  FROM gated GROUP BY md5(text)),
        |funnel AS (
        |  SELECT a.source, a.n_docs,
        |    coalesce(g.n_gated, 0) AS n_gated,
        |    coalesce(k.n_kept, 0) AS n_kept,
        |    coalesce(k.tokens_kept, 0) AS tokens_kept
        |  FROM (SELECT source, count(*) AS n_docs FROM d GROUP BY source) a
        |  LEFT JOIN (SELECT source, count(*) AS n_gated FROM gated
        |             GROUP BY source) g ON a.source = g.source
        |  LEFT JOIN (SELECT source, count(*) AS n_kept,
        |               sum(n_toks) AS tokens_kept FROM kept
        |             GROUP BY source) k ON a.source = k.source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_gated AS BIGINT) AS n_gated, CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(tokens_kept AS BIGINT) AS tokens_kept,
        |  round(tokens_kept / CAST((SELECT sum(tokens_kept) FROM funnel)
        |    AS DOUBLE), 6) AS token_share
        |FROM funnel ORDER BY source""".stripMargin,
    "tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(text), '[^a-z]+')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
        |  WHERE word <> '' GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |r AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |   tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)) AS tfidf,
        |   row_number() OVER (PARTITION BY tf.doc_id
        |     ORDER BY tf.tf DESC, df.df ASC, tf.word ASC) AS rnk
        |  FROM tf JOIN df USING (word), n)
        |SELECT doc_id, rnk, word, tf, df, tfidf
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "doc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> t <> '') AS ts
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(0, len(ts) - 1, 48)) AS start
        |  FROM d WHERE len(ts) >= 1)
        |SELECT doc_id,
        |  CAST(start // 48 AS BIGINT) AS chunk_no,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(len(ts[start + 1 : start + 64]) AS BIGINT) AS n_tok,
        |  md5(array_to_string(ts[start + 1 : start + 64], ' ')) AS fp
        |FROM c ORDER BY doc_id, chunk_no""".stripMargin,
    "quality_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(ts, x -> length(x)))
        |      AS DOUBLE) / len(ts), 6) AS mean_word_len,
        |    round(len(list_filter(ts, x -> regexp_matches(x, '[a-zA-Z]')))
        |      / CAST(len(ts) AS DOUBLE), 6) AS alpha_frac,
        |    round(((length(text) - length(replace(text, '#', ''))) +
        |      (length(text) - length(replace(text, '...', ''))) / 3)
        |      / CAST(len(ts) AS DOUBLE), 6) AS symbol_ratio,
        |    CAST(len(list_filter(ts, x -> list_contains(
        |      ['the','a','of','and','is','to','in','that'], lower(x))))
        |      AS BIGINT) AS n_stop
        |  FROM t)
        |SELECT *,
        |  n_words BETWEEN 40 AND 100000 AS ok_words,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mwl,
        |  alpha_frac >= 0.8 AS ok_alpha,
        |  symbol_ratio <= 0.1 AS ok_symbol,
        |  n_stop >= 2 AS ok_stop,
        |  (n_words BETWEEN 40 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1 AND n_stop >= 2 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // ranking is on the ROUNDED score with doc_id tie-break, so the
    // top-k cut is cross-engine-stable even where raw float sums
    // differ in the last bits
    "bm25_topk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // the at-rest index serve must reproduce the direct BM25 ranking
    // bit-for-bit, so its oracle IS the direct computation (same SQL
    // as bm25_topk)
    "bm25_index_topk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // serve-only twin: identical ranking semantics — the per-JVM
    // index cache changes only WHEN the build runs, never the math
    "bm25_serve_topk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // incremental refresh: the SERVED ranking after merging the
    // v1→v2 delta must equal the direct BM25 computation over v2 —
    // the oracle never sees the index, only the post-delta corpus
    "bm25_refresh" ->
      """WITH v2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 <> 7),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v2),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // segment-append twin: serving base + appended segment through
    // the tombstone filter must STILL equal the direct BM25 over v2
    "bm25_upsert_topk" ->
      """WITH v2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 <> 7),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v2),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // as-of (generation-pinned) serve: the SAME index that bm25_upsert
    // serves at its newest generation, read AS OF generation 0 — the
    // ranking must equal direct BM25 over the V1 snapshot even though
    // the index has absorbed the v1→v2 delta since (the segment's
    // postings/df-deltas/tombstones are excluded and the stats come
    // from the segment's pre-append snapshot)
    // MID-timeline as-of: a 2-segment index (v1→v2 delta, then a
    // drift append) served AS OF generation 1 — exactly the v2
    // corpus, so the oracle is the direct BM25 over v2 (the
    // bm25_upsert_topk replay): the pin reconstructs an interior
    // timeline point from base + segment 1 + segment 2's pre-append
    // stats snapshot
    "bm25_serve_asof_mid" ->
      """WITH v2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 <> 7),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v2),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "bm25_serve_asof" ->
      """WITH v1 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 20 = 0 THEN 'v1:' || text ELSE text END AS text
        |  FROM documents WHERE doc_id % 30 <> 0),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v1),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // compaction twin: folding the appended segment into the base is
    // a pure layout change, so serve-after-compact must STILL equal
    // the direct BM25 over v2
    "bm25_compact" ->
      """WITH v2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 <> 7),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v2),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "bpe_pairs" ->
      """WITH toks AS (SELECT list_filter(
        |  string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ts
        | FROM documents),
        |pairs AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
        |   i -> ts[i] || ' ' || ts[i+1])) AS pair
        | FROM toks WHERE len(ts) >= 2)
        |SELECT pair, count(*) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "text_fingerprint" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        | min(doc_id) AS first_doc, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "text_rollhash" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS rollhash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(lower(text), '')) AS c FROM documents),
        |cc AS (
        |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
        |  FROM chars WHERE c <> '' GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |  round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 4) AS entropy_bits
        |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // df cap (<= 8) mirrors Dedup.ngramJaccard's maxDf exactly: both
    // engines score Jaccard over the same capped shingle universe
    "dedup_ngram" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 8),
        |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT a, b, round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |ORDER BY a, b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 8),
        |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT a, b FROM inter JOIN sizes sa ON sa.doc_id = a
        |  JOIN sizes sb ON sb.doc_id = b
        |  WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY src)
        |SELECT label AS keep_id, count(*) AS cluster_size,
        | array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM labels GROUP BY label HAVING count(*) >= 2 ORDER BY keep_id""".stripMargin,
    // same reachability replay + the keep-LONGEST policy: keeper =
    // argmax (n_chars desc, doc_id asc) per cluster — integer keys,
    // so the whole keep decision hash-checks
    "dedup_keep_longest" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 8),
        |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT a, b FROM inter JOIN sizes sa ON sa.doc_id = a
        |  JOIN sizes sb ON sb.doc_id = b
        |  WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY src),
        |ranked AS (
        |  SELECT l.label, l.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY l.label
        |      ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY l.label) AS cluster_size,
        |    sum(d.n_chars) OVER (PARTITION BY l.label) AS total_chars
        |  FROM labels l JOIN documents d USING (doc_id))
        |SELECT label AS cluster_id, doc_id AS keeper_id,
        |  CAST(n_chars AS BIGINT) AS keeper_chars,
        |  CAST(cluster_size AS BIGINT) AS cluster_size,
        |  CAST(total_chars AS BIGINT) AS total_chars,
        |  CAST(cluster_size - 1 AS BIGINT) AS dropped_docs
        |FROM ranked WHERE rn = 1 AND cluster_size >= 2
        |ORDER BY cluster_id""".stripMargin,
    // same reachability replay — the star algorithm must produce
    // the identical clustering, just in O(log n) rounds
    "dedup_clusters_star" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 8),
        |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT a, b FROM inter JOIN sizes sa ON sa.doc_id = a
        |  JOIN sizes sb ON sb.doc_id = b
        |  WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.5),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |labels AS (SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY src)
        |SELECT label AS keep_id, count(*) AS cluster_size,
        | array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM labels GROUP BY label HAVING count(*) >= 2 ORDER BY keep_id""".stripMargin,
    // full banded-LSH pipeline on an md5 hash family: signatures,
    // banding, candidate set and verify all recomputed independently
    // by DuckDB — candidates must match bit-for-bit
    "dedup_minhash_md5" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
        |inter AS (SELECT c.a, c.b, count(*) AS i FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.a
        |  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN sizes za ON za.doc_id = a JOIN sizes zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    // continuous-ingest composite: the oracle replays the ENTIRE
    // funnel from scratch — the md5-family rejection of added docs
    // (vs v1 or earlier added, digest-set verify), then the direct
    // BM25 ranking over v2 minus the rejected set
    "ingest_pipeline" ->
      """WITH v1 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 20 = 0 THEN 'v1:' || text ELSE text END AS text
        |  FROM documents WHERE doc_id % 30 <> 0),
        |added AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 = 0),
        |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM added),
        |toksx AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM u),
        |shx AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toksx WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM shx),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 30 = 0 OR y.doc_id % 30 = 0),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b),
        |pairs AS (SELECT a, b FROM inter
        |  JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |  WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2),
        |rejected AS (SELECT DISTINCT
        |    CASE WHEN b % 30 = 0 THEN b ELSE a END AS doc_id FROM pairs),
        |v2k AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 30 <> 7
        |    AND doc_id NOT IN (SELECT doc_id FROM rejected)),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM v2k),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // two chained funnel rounds, both replayed from scratch: round
    // 1's gate over v1 ∪ added₁, the reject rule, round 2's gate
    // over (v1 ∪ SURVIVORS₁) ∪ added₂ — survivors, not all of
    // added₁: a rejected doc leaves no trace in the reference set —
    // then direct BM25 over the final corpus
    "ingest_pipeline2" ->
      """WITH v1 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 20 = 0 THEN 'v1:' || text ELSE text END AS text
        |  FROM documents WHERE doc_id % 30 <> 0),
        |added1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 30 = 0),
        |u1 AS (SELECT * FROM v1 UNION ALL SELECT * FROM added1),
        |toks1 AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM u1),
        |sh1 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks1 WHERE len(t) >= 3),
        |hh1 AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh1),
        |dsz1 AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh1 GROUP BY doc_id),
        |mh1 AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh1 CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk1 AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh1 GROUP BY doc_id, i // 4),
        |cand1 AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk1 x JOIN bk1 y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 30 = 0 OR y.doc_id % 30 = 0),
        |inter1 AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand1 c
        |  JOIN hh1 sa ON sa.doc_id = c.a
        |  JOIN hh1 sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b),
        |pairs1 AS (SELECT a, b FROM inter1
        |  JOIN dsz1 za ON za.doc_id = a JOIN dsz1 zb ON zb.doc_id = b
        |  WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2),
        |rejected1 AS (SELECT DISTINCT
        |    CASE WHEN b % 30 = 0 THEN b ELSE a END AS doc_id FROM pairs1),
        |survivors1 AS (SELECT doc_id, text FROM added1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rejected1)),
        |copies AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 15 = 0 AND doc_id % 30 <> 7),
        |novel AS (SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_reverse(
        |      list_filter(string_split_regex(text, '\s+'), x -> x <> '')), ' ') AS text
        |  FROM documents WHERE doc_id % 40 = 3 AND doc_id % 30 <> 7),
        |added2 AS (SELECT * FROM copies UNION ALL SELECT * FROM novel),
        |u2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM survivors1
        |  UNION ALL SELECT * FROM added2),
        |toks2 AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM u2),
        |sh2 AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks2 WHERE len(t) >= 3),
        |hh2 AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh2),
        |dsz2 AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh2 GROUP BY doc_id),
        |mh2 AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh2 CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk2 AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh2 GROUP BY doc_id, i // 4),
        |cand2 AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk2 x JOIN bk2 y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE y.doc_id >= 1000000),
        |inter2 AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand2 c
        |  JOIN hh2 sa ON sa.doc_id = c.a
        |  JOIN hh2 sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b),
        |pairs2 AS (SELECT a, b FROM inter2
        |  JOIN dsz2 za ON za.doc_id = a JOIN dsz2 zb ON zb.doc_id = b
        |  WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2),
        |rejected2 AS (SELECT DISTINCT b AS doc_id FROM pairs2),
        |final AS (SELECT doc_id, text FROM documents
        |    WHERE doc_id % 30 <> 7
        |      AND doc_id NOT IN (SELECT doc_id FROM rejected1)
        |  UNION ALL
        |  SELECT doc_id, text FROM added2
        |    WHERE doc_id NOT IN (SELECT doc_id FROM rejected2)),
        |tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |           t -> t <> '')) AS term
        |  FROM final),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT unnest(['data', 'model', 'system']) AS term),
        |dfc AS (SELECT term, count(*) AS df FROM tfc JOIN q USING (term) GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (t.tf * 2.2) /
        |      (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
        |  FROM tfc t JOIN q USING (term) JOIN dfc USING (term)
        |  JOIN dl ON dl.doc_id = t.doc_id, stats)
        |SELECT doc_id, round(sum(s), 6) AS score,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM s GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // at-rest near-dup check-in: the emitted pairs must equal the
    // batch md5 family over the FULL corpus restricted to pairs with
    // a delta member (doc_id % 4 = 1); the verify intersects DISTINCT
    // 48-bit digests (h1) — the digest form the index stores
    "dedup_checkin" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 4 = 1 OR y.doc_id % 4 = 1),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    // index-estate health card: every count replays from the corpus
    // (the fixture mutation sets are fixed pmod slices) and the
    // fold-due flags derive from those counts — wrong count or wrong
    // flag, the hash breaks. bm25_n_docs counts docs with >=1 alpha
    // token (the tokenizer's postings predicate); nd_docsets counts
    // docs with >=3 whitespace tokens (the shingler's predicate)
    "index_health" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 500 AND doc_id % 10 < 3),
        |v AS (SELECT vec_id FROM embeddings
        |      WHERE vec_id < 200 AND vec_id % 10 < 3),
        |alpha AS (SELECT doc_id FROM d WHERE len(list_filter(
        |  string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) >= 1),
        |sig AS (SELECT doc_id FROM d WHERE len(list_filter(
        |  string_split_regex(text, '\s+'), x -> x <> '')) >= 3),
        |c AS (SELECT
        |  (SELECT count(*) FROM alpha) AS alpha_n,
        |  (SELECT count(*) FROM alpha WHERE doc_id % 7 = 1) AS alpha_app,
        |  (SELECT count(*) FROM sig) AS sig_n,
        |  (SELECT count(*) FROM sig WHERE doc_id % 7 = 2) AS sig_app,
        |  (SELECT count(*) FROM d WHERE doc_id % 5 = 0) AS nd_tomb,
        |  (SELECT count(*) FROM v) AS v_n,
        |  (SELECT count(*) FROM v WHERE vec_id % 9 = 5) AS v_app,
        |  (SELECT count(*) FROM v WHERE vec_id % 5 = 0) AS v_tomb)
        |SELECT metric, value FROM (
        |  SELECT 'bm25_segments' AS metric, CAST(1 AS BIGINT) AS value FROM c
        |  UNION ALL SELECT 'bm25_n_docs', alpha_n + alpha_app FROM c
        |  UNION ALL SELECT 'bm25_fold_due', CAST(1 AS BIGINT) FROM c
        |  UNION ALL SELECT 'nd_docsets', sig_n + sig_app FROM c
        |  UNION ALL SELECT 'nd_tombstones', nd_tomb FROM c
        |  UNION ALL SELECT 'nd_gen', CAST(2 AS BIGINT) FROM c
        |  UNION ALL SELECT 'nd_fold_due',
        |    CASE WHEN nd_tomb * 10 > sig_n + sig_app THEN 1 ELSE 0 END FROM c
        |  UNION ALL SELECT 'ivf_lists', v_n + v_app FROM c
        |  UNION ALL SELECT 'ivf_tombstones', v_tomb FROM c
        |  UNION ALL SELECT 'ivf_gen', CAST(2 AS BIGINT) FROM c
        |  UNION ALL SELECT 'ivf_fold_due',
        |    CASE WHEN v_tomb * 10 > v_n + v_app THEN 1 ELSE 0 END FROM c)
        |ORDER BY metric""".stripMargin,
    // as-of (generation-pinned) lookup: the index has absorbed the
    // quarter check-in (gen 1) and the doc_id%8=0 removals (gen 2)
    // since, but a probe of re-tagged copies looked up AS OF
    // generation 0 must flag exactly what a lookup against the
    // PRISTINE base index (doc_id % 4 <> 1, no removals) would
    "dedup_lookup_asof_mid" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 8 <= 1),
        |toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM corpus),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id >= 1000000 OR y.doc_id >= 1000000),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    // mid-timeline twin: AS OF generation 1 — the quarter is admitted,
    // the removals do not exist yet, so the reference corpus is ALL
    // documents ∪ the probe copies (an interior timeline point,
    // driver-hashed)
    "dedup_lookup_asof" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 8 <= 1),
        |toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM corpus),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id >= 1000000 OR y.doc_id >= 1000000),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    // hot-bucket-cap twin: index-side candidates only from (band,
    // bucket) keys whose INDEX posting count (doc_id % 4 <> 1 side)
    // is <= 1; delta-delta candidates are uncapped — mirrors
    // neardupCheckIn(capBucket = 1) exactly
    "dedup_checkin_capped" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |bsz AS (SELECT band, bucket, count(*) AS c FROM bk
        |  WHERE doc_id % 4 <> 1 GROUP BY band, bucket),
        |candI AS (SELECT DISTINCT least(i.doc_id, d.doc_id) AS a,
        |    greatest(i.doc_id, d.doc_id) AS b
        |  FROM bk i JOIN bk d ON i.band = d.band AND i.bucket = d.bucket
        |  JOIN bsz z ON z.band = i.band AND z.bucket = i.bucket
        |  WHERE i.doc_id % 4 <> 1 AND d.doc_id % 4 = 1 AND z.c <= 1),
        |candD AS (SELECT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 4 = 1 AND y.doc_id % 4 = 1),
        |cand AS (SELECT DISTINCT a, b FROM
        |  (SELECT * FROM candI UNION ALL SELECT * FROM candD)),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    // removal twin: base docs with doc_id % 8 = 0 are tombstoned
    // before the check-in — the oracle simply replays the family
    // over the corpus WITHOUT them (delta docs are % 4 = 1, never
    // % 8 = 0, so only the indexed side shrinks)
    "dedup_checkin_removed" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 8 <> 0),
        |sh AS (SELECT DISTINCT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |   for i in range(1, len(t) - 1)]) AS shingle FROM toks WHERE len(t) >= 3),
        |hh AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 1, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(shingle), 13, 12), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM sh),
        |dsz AS (SELECT doc_id, count(DISTINCT h1) AS sz FROM hh GROUP BY doc_id),
        |mh AS (SELECT doc_id, i, min((h1 + i * h2) & 281474976710655) AS h
        |  FROM hh CROSS JOIN range(16) t(i) GROUP BY doc_id, i),
        |bk AS (SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY i)) AS bucket
        |  FROM mh GROUP BY doc_id, i // 4),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bk x JOIN bk y
        |  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 4 = 1 OR y.doc_id % 4 = 1),
        |inter AS (SELECT c.a, c.b, count(DISTINCT sa.h1) AS i FROM cand c
        |  JOIN hh sa ON sa.doc_id = c.a
        |  JOIN hh sb ON sb.doc_id = c.b AND sb.h1 = sa.h1
        |  GROUP BY c.a, c.b)
        |SELECT a, b, round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN dsz za ON za.doc_id = a JOIN dsz zb ON zb.doc_id = b
        |WHERE round(i / CAST(za.sz + zb.sz - i AS DOUBLE), 6) >= 0.2
        |ORDER BY a, b""".stripMargin,
    "sim_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS qid, c.vec_id AS cid, list_cosine_similarity(q.v, c.v) AS sim
        |  FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
        |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk FROM s)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "hybrid_rrf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ds AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    list_cosine_similarity(q.v, c.v) AS sim
        |  FROM e q JOIN e c
        |    ON q.vec_id % 10 = 0 AND q.vec_id < 50 AND q.vec_id <> c.vec_id),
        |dense AS (SELECT qid, cid, rd FROM (
        |  SELECT qid, cid, row_number() OVER
        |    (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rd FROM ds)
        |  WHERE rd <= 20),
        |tok AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                              x -> x <> '')) AS ts
        |  FROM documents),
        |ls AS (SELECT q.doc_id AS qid, c.doc_id AS cid,
        |    len(list_intersect(q.ts, c.ts)) /
        |      CAST(len(q.ts) + len(c.ts) - len(list_intersect(q.ts, c.ts)) AS DOUBLE)
        |      AS sim
        |  FROM tok q JOIN tok c
        |    ON q.doc_id % 10 = 0 AND q.doc_id < 50 AND q.doc_id <> c.doc_id),
        |lex AS (SELECT qid, cid, rl FROM (
        |  SELECT qid, cid, row_number() OVER
        |    (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rl FROM ls)
        |  WHERE rl <= 20),
        |fused AS (
        |  SELECT coalesce(dense.qid, lex.qid) AS qid,
        |    coalesce(dense.cid, lex.cid) AS cid,
        |    coalesce(1.0 / (60 + rd), 0) + coalesce(1.0 / (60 + rl), 0) AS rrf,
        |    CAST(coalesce(rd, 0) AS BIGINT) AS r_dense,
        |    CAST(coalesce(rl, 0) AS BIGINT) AS r_lex
        |  FROM dense FULL OUTER JOIN lex
        |    ON dense.qid = lex.qid AND dense.cid = lex.cid)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(rrf, 6) AS rrf,
        |  r_dense, r_lex
        |FROM (SELECT *, row_number() OVER
        |    (PARTITION BY qid ORDER BY rrf DESC, cid ASC) AS rnk FROM fused)
        |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,
    // replays the ENTIRE md5-family SimHash pipeline: 60-bit token
    // hashes from the first 15 md5 hex chars (16 would overflow
    // signed BIGINT mid-fold), per-bit votes over distinct tokens,
    // signature assembly, C(6,3) combinatorial block keys, popcount verify
    "dedup_simhash_md5" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substring(md5(t), 1, 15), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) AS h
        |  FROM (SELECT doc_id,
        |      unnest(list_filter(string_split_regex(text, '\s+'),
        |             x -> x <> '')) AS t
        |    FROM documents)),
        |votes AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM tok, generate_series(0, 59) t(i) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |      AS BIGINT) AS simhash
        |  FROM votes GROUP BY 1),
        |combos AS (
        |  SELECT row_number() OVER (ORDER BY b1, b2, b3) AS band, b1, b2, b3
        |  FROM generate_series(0, 5) t1(b1), generate_series(0, 5) t2(b2),
        |       generate_series(0, 5) t3(b3)
        |  WHERE b1 < b2 AND b2 < b3),
        |bands AS (
        |  SELECT doc_id, simhash, c.band,
        |    ((simhash >> (c.b1 * 10)) & 1023) * 1048576 +
        |    ((simhash >> (c.b2 * 10)) & 1023) * 1024 +
        |    ((simhash >> (c.b3 * 10)) & 1023) AS bkey
        |  FROM sigs, combos c),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |    x.simhash AS sa, y.simhash AS sb
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
        |SELECT a, b,
        |  CAST(bit_count(CAST(xor(sa, sb) AS BIGINT)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(CAST(xor(sa, sb) AS BIGINT)) <= 3
        |ORDER BY a, b""".stripMargin,
    // replays the ENTIRE asymmetric-hashing ANN pipeline: integer
    // coefficient derivation (first 8 md5 hex chars → bigint), exact
    // integer plane projections over the ×1024-quantized vectors
    // (corpus keeps sign bits, queries full projections), asymmetric
    // score Σ ±qproj, top-24 shortlist, exact-cosine re-rank — every
    // intermediate is exact BIGINT math, so the signature/shortlist
    // logic itself is hash-checked cross-engine (nBits=1024,
    // shortlist=24, k=5, 8 queries)
    "sim_ann_md5" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |coef AS (
        |  SELECT i, j,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(
        |            substring(md5(CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 2000003 - 1000001 AS w
        |  FROM generate_series(0, 1023) t1(i), generate_series(0, 63) t2(j)),
        |dots AS (
        |  SELECT e.vec_id, c.i, sum(c.w * e.vq[c.j + 1]) AS d
        |  FROM e, coef c GROUP BY 1, 2),
        |qproj AS (SELECT vec_id AS qid, i, d FROM dots WHERE vec_id < 8),
        |signs AS (SELECT vec_id, i, d >= 0 AS sg FROM dots),
        |ascore AS (
        |  SELECT q.qid, s.vec_id AS cid,
        |    sum(CASE WHEN s.sg THEN q.d ELSE -q.d END) AS sc
        |  FROM qproj q JOIN signs s ON s.i = q.i AND s.vec_id <> q.qid
        |  GROUP BY 1, 2),
        |short AS (
        |  SELECT qid, cid FROM (
        |    SELECT qid, cid,
        |      row_number() OVER (PARTITION BY qid ORDER BY sc DESC, cid ASC) AS rn
        |    FROM ascore) WHERE rn <= 24),
        |s AS (
        |  SELECT sh.qid, sh.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM short sh JOIN e eq ON eq.vec_id = sh.qid JOIN e ec ON ec.vec_id = sh.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM s)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // replays BOTH Lloyd iterations bit-for-bit: centroids are exact
    // integer SUMS of x1024-quantized members (cosine is scale-
    // invariant, so sum ≡ mean) and every dot stays < 2^53, so the
    // scores are exact integers-in-doubles in both engines — ranking
    // raw doubles cross-engine is safe, and iterative k-means itself
    // becomes oracle-hash-checkable (k=8, 2 assignment passes)
    "emb_kmeans" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
        |       round(avg(sim), 6) AS mean_sim
        |FROM a2 GROUP BY cell ORDER BY cell""".stripMargin,
    // emb_kmeans's 2-round Lloyd replay through the final assignment
    // (a2 carries each vector's cosine to its own centroid — exact
    // integer dots), then per-cell population moments and the rounded
    // z-score cut (the ts_anomaly discipline: compare the ROUNDED z)
    "emb_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |stats AS (SELECT cell, avg(sim) AS mu, stddev_pop(sim) AS sd
        |  FROM a2 GROUP BY cell),
        |z AS (SELECT a2.vec_id, a2.cell, a2.sim,
        |    round(CASE WHEN s.sd < 1e-12 THEN 0.0
        |          ELSE (a2.sim - s.mu) / s.sd END, 6) AS z
        |  FROM a2 JOIN stats s USING (cell))
        |SELECT vec_id, cell, round(sim, 6) AS sim, z,
        |       z < -2.0 AS is_outlier
        |FROM z ORDER BY vec_id""".stripMargin,
    // replays the PQ trainer bit-for-bit: per-subspace 2-pass Lloyd
    // with integer-sum centroids (the emb_kmeans trick with the
    // subspace id as one more grouping key)
    "emb_pq" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, m, vq[m * 8 + 1 : m * 8 + 8] AS sv
        |  FROM e, generate_series(0, 7) t(m)),
        |c0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < 32),
        |s1 AS (
        |  SELECT sub.vec_id, sub.m, sub.sv, c.code,
        |    list_inner_product(sub.sv, c.cv) /
        |      (sqrt(list_inner_product(sub.sv, sub.sv)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM sub JOIN c0 c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |        ORDER BY sim DESC, code ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT m, code, list(s ORDER BY i) AS cv FROM (
        |    SELECT m, code, i, CAST(sum(sv[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 8) t(i)
        |    GROUP BY m, code, i)
        |  GROUP BY m, code),
        |s2 AS (
        |  SELECT sub.vec_id, sub.m, c.code,
        |    list_inner_product(sub.sv, c.cv) /
        |      (sqrt(list_inner_product(sub.sv, sub.sv)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM sub JOIN c1 c USING (m)),
        |a2 AS (SELECT vec_id, m, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |        ORDER BY sim DESC, code ASC) AS rn FROM s2)
        |  WHERE rn = 1)
        |SELECT vec_id, m, code FROM a2 ORDER BY vec_id, m""".stripMargin,
    // continues emb_pq's replay through ADC serving: reconstruct each
    // corpus vector from its codebook centroids, rank by exact-integer
    // cosine, and compare with the exact top-k — the recall VALUES
    // themselves hash-match, not just a pinned bound
    "emb_pq_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, m, vq[m * 8 + 1 : m * 8 + 8] AS sv
        |  FROM e, generate_series(0, 7) t(m)),
        |c0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < 32),
        |s1 AS (
        |  SELECT sub.vec_id, sub.m, sub.sv, c.code,
        |    list_inner_product(sub.sv, c.cv) /
        |      (sqrt(list_inner_product(sub.sv, sub.sv)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM sub JOIN c0 c USING (m)),
        |a1 AS (SELECT vec_id, m, sv, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |        ORDER BY sim DESC, code ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT m, code, list(s ORDER BY i) AS cv FROM (
        |    SELECT m, code, i, CAST(sum(sv[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 8) t(i)
        |    GROUP BY m, code, i)
        |  GROUP BY m, code),
        |s2 AS (
        |  SELECT sub.vec_id, sub.m, c.code,
        |    list_inner_product(sub.sv, c.cv) /
        |      (sqrt(list_inner_product(sub.sv, sub.sv)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM sub JOIN c1 c USING (m)),
        |a2 AS (SELECT vec_id, m, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |        ORDER BY sim DESC, code ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |recon AS (
        |  SELECT a2.vec_id AS cid, flatten(list(c.cv ORDER BY a2.m)) AS rv
        |  FROM a2 JOIN c1 c ON a2.m = c.m AND a2.code = c.code
        |  GROUP BY a2.vec_id),
        |q AS (SELECT vec_id AS qid, vq AS qv FROM e WHERE vec_id < 8),
        |adc AS (SELECT qid, cid FROM (
        |    SELECT q.qid, r.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_inner_product(q.qv, r.rv) /
        |        (sqrt(list_inner_product(q.qv, q.qv)) *
        |         sqrt(list_inner_product(r.rv, r.rv))) DESC, r.cid ASC) AS rn
        |    FROM q JOIN recon r ON r.cid <> q.qid)
        |  WHERE rn <= 50),
        |ex AS (SELECT qid, cid FROM (
        |    SELECT q.qid, e.vec_id AS cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY list_inner_product(q.qv, e.vq) /
        |        (sqrt(list_inner_product(q.qv, q.qv)) *
        |         sqrt(list_inner_product(e.vq, e.vq))) DESC, e.vec_id ASC) AS rn
        |    FROM q JOIN e ON e.vec_id <> q.qid)
        |  WHERE rn <= 5)
        |SELECT ex.qid,
        |  round(count(adc.cid) / CAST(count(*) AS DOUBLE), 6) AS recall
        |FROM ex LEFT JOIN adc ON ex.qid = adc.qid AND ex.cid = adc.cid
        |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin,
    // replays the WHOLE index lifecycle: the 2-pass quantized k-means
    // (same CTEs as emb_kmeans), integer-exact centroid routing to
    // nProbe=2 cells, membership lookup, exact-cosine serve — so the
    // at-rest index query (build → partitioned write → pruned read →
    // score) is hash-checked end-to-end
    "ivf_index_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // serve-only twin (per-JVM cached build; identical math) and the
    // vector-upsert fixture: Lloyd trains on the BASE slice
    // (vec_id % 10 <> 3), the held-out slice is appended against the
    // FIXED centroids, and the final assignment (a2) + serve run over
    // ALL vectors — exactly what the Spark side does with
    // append-mode list files
    "ivf_serve_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // as-of (generation-pinned) serve: the index has absorbed an
    // append of query-duplicates (gen 1) and the serve-intersecting
    // removal set (gen 2) since, but read AS OF generation 0 it must
    // reproduce the pristine full-corpus serve exactly
    "ivf_serve_asof_mid" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid
        |  UNION ALL
        |  SELECT pr.qid, a.vec_id + 1000000 AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id < 8),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid
        |  JOIN e ec ON ec.vec_id =
        |    CASE WHEN c.cid >= 1000000 THEN c.cid - 1000000 ELSE c.cid END),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // mid-timeline twin: AS OF generation 1 — the query-duplicate
    // appends are visible (rank-1 leaks by construction: each dup sits
    // in its original's trained cell with cosine 1), the gen-2
    // removals are not; the dup rows route exactly where the frozen
    // codebook put them (a2's own assignment, +1000000 ids)
    "ivf_serve_asof" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // removal twin: vec_id % 7 = 3 tombstoned — same full-corpus
    // build/routing, but removed ids are excluded from the candidate
    // lists before scoring (queries still issue; a removed query's
    // own vector can't match itself anyway)
    "ivf_serve_removed" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell
        |  WHERE a.vec_id <> pr.qid AND a.vec_id % 7 <> 3),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // retrain twin: remove vec_id % 7 = 3, then FULL retrain at the
    // same path — rebuild deletes the index dir including tombstones,
    // so the oracle is the plain full-corpus serve replay (identical
    // SQL to ivf_serve_topk); the row hashes green only if the
    // removed-then-reindexed ids really serve again
    "ivf_retrain_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "ivf_append_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM embeddings),
        |eb AS (SELECT * FROM e WHERE vec_id % 10 <> 3),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM eb WHERE vec_id < 8),
        |s1 AS (
        |  SELECT e.vec_id, e.vq, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM eb e, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s2)
        |  WHERE rn = 1),
        |qp AS (
        |  SELECT e.vec_id AS qid, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS s
        |  FROM e, c1 c WHERE e.vec_id < 8),
        |pr AS (SELECT qid, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, cell ASC) AS rn FROM qp)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT pr.qid, a.vec_id AS cid
        |  FROM pr JOIN a2 a ON a.cell = pr.cell WHERE a.vec_id <> pr.qid),
        |sc AS (
        |  SELECT c.qid, c.cid, list_cosine_similarity(eq.v, ec.v) AS sim
        |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ec ON ec.vec_id = c.cid),
        |r AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rnk
        |  FROM sc)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // recall contracts: the oracle pins recall_ok TRUE per query id —
    // the row hashes green only if the ANN/IVF index actually meets
    // its ≥0.8 per-query recall bar vs the exact top-k
    "sim_ann_recall" ->
      """SELECT vec_id AS qid, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,
    "sim_ivf_recall" ->
      """SELECT vec_id AS qid, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY qid""".stripMargin,
    // recall-after-append: queries are the first 8 APPENDED vectors
    // (vec_id ≡ 3 mod 10) — the slice the frozen codebook never saw.
    // The oracle pins two booleans TRUE: mean recall ≥ 0.5 at
    // nProbe=4, and the append loses ≤ 0.2 mean recall vs a
    // full-retrain index (the drift guard of the FAISS add model)
    "ivf_append_recall" ->
      """SELECT 'append_mean_recall_ge_0_5' AS metric, TRUE AS ok
        |UNION ALL
        |SELECT 'append_within_slack_of_retrain' AS metric, TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // decoded image-feature vectors through the full IVF lifecycle:
    // the real-PNG-decode histograms match the generating formula,
    // IVF serve reaches the recall floor vs brute force, append/remove
    // are exactly counted, and takedown restores the pristine serve
    // bit-for-bit — all tie-immune booleans pinned TRUE
    "mm_ivf_lifecycle" ->
      """SELECT unnest([
        |  'mm_ivf_append_counted', 'mm_ivf_recall_ge_0_6',
        |  'mm_ivf_remove_counted', 'mm_ivf_remove_restores_serve',
        |  'mm_vectors_match_formula']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // the audio twin: real-WAV-decode amplitude histograms match the
    // PCM generator formula, and the same IVF lifecycle pins hold
    "audio_ivf_lifecycle" ->
      """SELECT unnest([
        |  'au_ivf_append_counted', 'au_ivf_recall_ge_0_6',
        |  'au_ivf_remove_counted', 'au_ivf_remove_restores_serve',
        |  'au_vectors_match_formula']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // the shard manifest plus one index_gen row per family recording
    // the generation retrieval ran against — gens read from the live
    // estate (bm25: 1 segment; neardup: check-in + removal = 2; ivf:
    // removal = 1), pinned here as literals so timeline drift breaks
    // the hash
    "manifest_pinned" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |gated AS (SELECT * FROM toks WHERE n_tok >= 20),
        |kept AS (
        |  SELECT min(doc_id) AS doc_id, arg_min(n_tok, doc_id) AS n_tok
        |  FROM gated GROUP BY md5(text)),
        |tr AS (
        |  SELECT doc_id, n_tok FROM kept
        |  WHERE substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'),
        |sh AS (
        |  SELECT doc_id, n_tok,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(
        |        md5('shuffle:ep1:' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 16 AS shard
        |  FROM tr),
        |m AS (
        |  SELECT CAST(shard AS BIGINT) AS shard,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |    CAST(min(doc_id) AS BIGINT) AS first_doc,
        |    CAST(max(doc_id) AS BIGINT) AS last_doc
        |  FROM sh GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'shard' AS kind, CAST(shard AS VARCHAR) AS key, n_docs,
        |    total_tokens, first_doc, last_doc, CAST(NULL AS BIGINT) AS gen
        |  FROM m
        |  UNION ALL SELECT 'index_gen', 'bm25', NULL, NULL, NULL, NULL, 1
        |  UNION ALL SELECT 'index_gen', 'neardup', NULL, NULL, NULL, NULL, 2
        |  UNION ALL SELECT 'index_gen', 'ivf', NULL, NULL, NULL, NULL, 1)
        |ORDER BY kind, key""".stripMargin,
    // the consumer side: one boolean per shard the artifact names
    // (the shard set is oracle-derived via the same CTE, so an extra
    // or missing shard breaks the row set) + one reproduced-retrieval
    // boolean per family, all pinned TRUE
    "train_read" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |gated AS (SELECT * FROM toks WHERE n_tok >= 20),
        |kept AS (
        |  SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        |tr AS (
        |  SELECT doc_id FROM kept
        |  WHERE substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'),
        |sh AS (
        |  SELECT DISTINCT
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(
        |        md5('shuffle:ep1:' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 16 AS shard
        |  FROM tr)
        |SELECT metric, TRUE AS ok FROM (
        |  SELECT 'tr_shard_' || CAST(shard AS VARCHAR) AS metric FROM sh
        |  UNION ALL SELECT unnest(['tr_bm25_reproduced',
        |    'tr_nd_reproduced', 'tr_ivf_reproduced']))
        |ORDER BY metric""".stripMargin,
    // replay at the manifest's pinned generations after further
    // mutations: live serves have provably drifted, as-of serves are
    // bit-identical to the at-manifest captures
    "manifest_replay" ->
      """SELECT unnest([
        |  'mr_bm25_asof_matches', 'mr_bm25_live_differs',
        |  'mr_ivf_asof_matches', 'mr_ivf_live_differs',
        |  'mr_nd_asof_matches', 'mr_nd_live_differs']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // estate maintenance: read each family's health card, execute
    // EXACTLY the policy-due folds (nd compact + ivf retrain; bm25 is
    // under its default segment budget and must stay untouched),
    // re-read — quiet-after, lookup preservation, and a fresh-build
    // match for the retrain are all pinned TRUE
    "maintain_estate" ->
      """SELECT unnest([
        |  'est_bm25_not_due_before', 'est_bm25_untouched_by_maintenance',
        |  'est_ivf_due_before', 'est_ivf_fold_matches_fresh_build',
        |  'est_ivf_quiet_after',
        |  'est_nd_due_before', 'est_nd_lookup_preserved',
        |  'est_nd_quiet_after']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // recovery drill: kill a REAL mutation mid-flight per family (the
    // fault-injection hooks), pin torn reads (committed prefix
    // serves, mutations refuse), run each family's repair, pin the
    // post-repair serve bit-identical and the replayed mutation
    // landing
    "recovery_drill" ->
      """SELECT unnest([
        |  'rd_bm25_crash_invisible', 'rd_bm25_crash_left_garbage',
        |  'rd_bm25_crash_mid_flight', 'rd_bm25_replayed_mutation_lands',
        |  'rd_bm25_serve_preserved', 'rd_bm25_sweep_reclaims',
        |  'rd_ivf_crash_mid_flight',
        |  'rd_ivf_mutable_after_repair', 'rd_ivf_mutation_real',
        |  'rd_ivf_repair_restores', 'rd_ivf_torn_refuses_mutation',
        |  'rd_ivf_torn_serves_committed',
        |  'rd_nd_crash_mid_flight',
        |  'rd_nd_mutable_after_repair', 'rd_nd_mutation_real',
        |  'rd_nd_repair_restores', 'rd_nd_torn_refuses_mutation',
        |  'rd_nd_torn_serves_committed']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // snapshot time travel: a retained manifest snapshot replays its
    // ranking bit-identically across a history-destroying rewrite;
    // expiry lets the next sweep reclaim what only it referenced
    "bm25_snapshot_asof" ->
      """SELECT unnest([
        |  'snap_expired_fails_fast', 'snap_expiry_reclaims_dirs',
        |  'snap_live_moved_on', 'snap_retained_replays_after_rewrite',
        |  'snap_rewrite_kills_inplace_asof']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // the near-dup and IVF twins of the same snapshot-log contract:
    // a retained snapshot replays flagged pairs / rankings
    // bit-identically across the family's history-destroying rewrite
    // (compact / retrain), and expiry lets the next sweep reclaim it
    "neardup_snapshot_asof" ->
      """SELECT unnest([
        |  'snap_expired_fails_fast', 'snap_expiry_reclaims_dirs',
        |  'snap_live_moved_on', 'snap_retained_replays_after_rewrite',
        |  'snap_rewrite_kills_inplace_asof']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    "ivf_snapshot_asof" ->
      """SELECT unnest([
        |  'snap_expired_fails_fast', 'snap_expiry_reclaims_dirs',
        |  'snap_live_moved_on', 'snap_retained_replays_after_rewrite',
        |  'snap_rewrite_kills_inplace_asof']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // mid-estate crash: a maintenance pass dying with one family's
    // fold mid-flight (injected) leaves an estate the next plain pass
    // converges — the composition of per-family crash safety, drilled
    // in BOTH directions (ecd_: nd crashes beside a completing IVF
    // fold; ecd2_: the mirrored IVF crash beside a completing nd fold)
    "estate_crash_drill" ->
      """SELECT unnest([
        |  'ecd_crash_left_garbage', 'ecd_ivf_due_before',
        |  'ecd_nd_due_before', 'ecd_nd_lookup_intact_after_crash',
        |  'ecd_nd_still_due_after_crash',
        |  'ecd_pass1_ivf_folded', 'ecd_pass1_nd_crashed',
        |  'ecd_pass2_ivf_untouched', 'ecd_pass2_lookup_preserved',
        |  'ecd_pass2_nd_quiet', 'ecd_pass2_swept_garbage',
        |  'ecd2_both_due_before', 'ecd2_crash_left_garbage',
        |  'ecd2_ivf_serve_intact_after_crash',
        |  'ecd2_ivf_still_due_after_crash',
        |  'ecd2_pass1_ivf_crashed', 'ecd2_pass1_nd_folded',
        |  'ecd2_pass2_ivf_quiet_and_rebuilt', 'ecd2_pass2_nd_untouched',
        |  'ecd2_pass2_swept_garbage']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // estate-level snapshot manifest: per-family SNAPSHOT pins replay
    // the full retrieval estate bit-identically across folds of every
    // family (generation pins die at the first fold); the expired
    // decoy proves retention + reclaim estate-wide
    "estate_snapshot_manifest" ->
      """SELECT unnest([
        |  'esm_bm25_replays_across_fold', 'esm_expired_decoy_fails_fast',
        |  'esm_expiry_reclaimed_dirs', 'esm_ivf_replays_across_fold',
        |  'esm_live_moved_on', 'esm_nd_replays_across_fold',
        |  'esm_pins_present']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // estate stream ingest: one micro-batch stream mutating all three
    // families with injected deaths BETWEEN family commits — the
    // retried batch lands only the families whose app-scoped
    // watermark hasn't passed, and the end state matches a crash-free
    // batch twin bit-for-bit
    "estate_stream_ingest" ->
      """SELECT unnest([
        |  'esi_crash_after_bm_fired', 'esi_crash_after_nd_fired',
        |  'esi_crashed_retry_skipped_committed_nd',
        |  'esi_end_state_matches_batch_twin',
        |  'esi_estate_inconsistent_after_crash',
        |  'esi_final_retry_lands_only_ivf', 'esi_gate_nonvacuous',
        |  'esi_redelivery_noop', 'esi_twin_single_pass_all_landed'])
        |  AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    "fold_trigger" ->
      """SELECT unnest([
        |  'bm25_clears_after_fold', 'bm25_fires_over_segment_budget',
        |  'bm25_fold_preserves_serve', 'bm25_quiet_on_pristine',
        |  'bm25_quiet_under_budget',
        |  'ivf_clears_after_fold', 'ivf_fires_over_tombstone_budget',
        |  'ivf_fold_restores_pristine_serve', 'ivf_quiet_on_pristine',
        |  'ivf_removal_changes_serve',
        |  'nd_clears_after_fold', 'nd_fires_over_tombstone_budget',
        |  'nd_fold_preserves_lookup', 'nd_quiet_on_pristine']) AS metric,
        |  TRUE AS ok
        |ORDER BY metric""".stripMargin,
    // replays the ENTIRE derived-blocking pipeline (seed scoring,
    // top-nProbe cell assignment, candidate join, exact verify) so the
    // IVF-cell near-dup is oracle-hash-checked end-to-end, no
    // ground-truth column involved — nCells=16, nProbe=4, minSim=0.3
    // replays the TRAINED blocking over the r11 exact-collapse: group
    // bit-identical vectors (rep = min vec_id), then 2-round
    // integer-exact Lloyd over the DISTINCT vectors with the
    // deterministic training sample (rep ≡ 0 mod
    // greatest(1, floor(n_u/1024)) — identity below the cap), top-4
    // multi-probe assignment of the reps, candidate join, exact
    // double-cosine verify, symmetrized per-group min neighbor, and
    // the member-level FOREST edge (one edge per dropped vector: own
    // rep for exact twins unless a smaller verified neighbor rep
    // shadows the whole group — two-scalar comparison per member, so
    // the replay cannot drift)
    "sim_neardup" ->
      """WITH g AS (
        |  SELECT embedding, min(vec_id) AS rep FROM embeddings GROUP BY embedding),
        |e AS (
        |  SELECT rep AS vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM g),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e
        |  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e)),
        |st AS (SELECT greatest(1, CAST(floor(count(*) / 1024.0) AS BIGINT)) AS step
        |  FROM e),
        |tr AS (SELECT e.vec_id, e.vq FROM e, st WHERE e.vec_id % st.step = 0),
        |s1 AS (
        |  SELECT tr.vec_id, tr.vq, c.cell,
        |    list_inner_product(tr.vq, c.cv) /
        |      (sqrt(list_inner_product(tr.vq, tr.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM tr, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |k2 AS (SELECT CASE WHEN count(*) > 16
        |    THEN CAST(ceil(sqrt(count(*))) AS BIGINT) ELSE 1 END AS k2
        |  FROM c1),
        |ss AS (SELECT cell AS sup, cv AS sv FROM (
        |    SELECT cell, cv, row_number() OVER (ORDER BY cell) AS rn FROM c1), k2
        |  WHERE rn <= k2.k2),
        |cs AS (SELECT cell, cv, sup FROM (
        |    SELECT c.cell, c.cv, s.sup,
        |      row_number() OVER (PARTITION BY c.cell ORDER BY
        |        list_inner_product(c.cv, s.sv) /
        |          (sqrt(list_inner_product(c.cv, c.cv)) *
        |           sqrt(list_inner_product(s.sv, s.sv))) DESC, s.sup ASC) AS rn
        |    FROM c1 c, ss s) WHERE rn = 1),
        |vs AS (SELECT vec_id, sup FROM (
        |    SELECT e.vec_id, s.sup,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_inner_product(e.vq, s.sv) /
        |          (sqrt(list_inner_product(e.vq, e.vq)) *
        |           sqrt(list_inner_product(s.sv, s.sv))) DESC, s.sup ASC) AS rn
        |    FROM e, ss s) WHERE rn <= 3),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e JOIN vs ON vs.vec_id = e.vec_id JOIN cs c ON c.sup = vs.sup),
        |asg AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
        |    FROM s2) WHERE rn <= 4),
        |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |edr AS (SELECT rep AS vec_id, CAST(embedding AS DOUBLE[]) AS v FROM g),
        |pairs AS (
        |  SELECT c.a, c.b, list_cosine_similarity(ea.v, eb.v) AS s
        |  FROM cand c JOIN edr ea ON ea.vec_id = c.a JOIN edr eb ON eb.vec_id = c.b
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3),
        |nb AS (SELECT gid, r AS nr, s AS nsim FROM (
        |  SELECT gid, r, s, row_number() OVER (PARTITION BY gid ORDER BY r) AS rn
        |  FROM (SELECT b AS gid, a AS r, s FROM pairs
        |        UNION ALL SELECT a AS gid, b AS r, s FROM pairs))
        |  WHERE rn = 1),
        |mem AS (SELECT m.vec_id, gg.rep, CAST(m.embedding AS DOUBLE[]) AS v
        |  FROM embeddings m JOIN g gg ON m.embedding = gg.embedding),
        |edge AS (
        |  SELECT m.vec_id AS b, m.rep, m.v, nb.nr, nb.nsim,
        |    CASE WHEN m.vec_id = m.rep
        |      THEN CASE WHEN nb.nr < m.rep THEN nb.nr END
        |      ELSE CASE WHEN nb.nr < m.vec_id AND nb.nr < m.rep THEN nb.nr
        |           ELSE m.rep END
        |    END AS a
        |  FROM mem m LEFT JOIN nb ON nb.gid = m.rep)
        |SELECT a, b,
        |  round(CASE WHEN a = rep AND b <> rep
        |    THEN list_cosine_similarity(v, v) ELSE nsim END, 6) AS sim
        |FROM edge WHERE a IS NOT NULL
        |ORDER BY b""".stripMargin,
    // the near-dup replay plus the keep rule: a vector survives iff
    // no lower-id vector is within minSim — the full SemDeDup
    // decision (exact collapse, cells, candidates, verify,
    // min-neighbor filter) cross-checked. Non-rep members are always
    // shadowed by their own rep, so the keep-list is exactly the reps
    // with no smaller verified neighbor.
    "sem_dedup_keep" ->
      """WITH g AS (
        |  SELECT embedding, min(vec_id) AS rep FROM embeddings GROUP BY embedding),
        |e AS (
        |  SELECT rep AS vec_id, list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS vq
        |  FROM g),
        |c0 AS (SELECT vec_id AS cell, vq AS cv FROM e
        |  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e)),
        |st AS (SELECT greatest(1, CAST(floor(count(*) / 1024.0) AS BIGINT)) AS step
        |  FROM e),
        |tr AS (SELECT e.vec_id, e.vq FROM e, st WHERE e.vec_id % st.step = 0),
        |s1 AS (
        |  SELECT tr.vec_id, tr.vq, c.cell,
        |    list_inner_product(tr.vq, c.cv) /
        |      (sqrt(list_inner_product(tr.vq, tr.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM tr, c0 c),
        |a1 AS (SELECT vec_id, vq, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cell ASC) AS rn FROM s1)
        |  WHERE rn = 1),
        |c1 AS (
        |  SELECT cell, list(s ORDER BY i) AS cv FROM (
        |    SELECT cell, i, CAST(sum(vq[i]) AS BIGINT) AS s
        |    FROM a1, generate_series(1, 64) t(i)
        |    GROUP BY cell, i)
        |  GROUP BY cell),
        |k2 AS (SELECT CASE WHEN count(*) > 16
        |    THEN CAST(ceil(sqrt(count(*))) AS BIGINT) ELSE 1 END AS k2
        |  FROM c1),
        |ss AS (SELECT cell AS sup, cv AS sv FROM (
        |    SELECT cell, cv, row_number() OVER (ORDER BY cell) AS rn FROM c1), k2
        |  WHERE rn <= k2.k2),
        |cs AS (SELECT cell, cv, sup FROM (
        |    SELECT c.cell, c.cv, s.sup,
        |      row_number() OVER (PARTITION BY c.cell ORDER BY
        |        list_inner_product(c.cv, s.sv) /
        |          (sqrt(list_inner_product(c.cv, c.cv)) *
        |           sqrt(list_inner_product(s.sv, s.sv))) DESC, s.sup ASC) AS rn
        |    FROM c1 c, ss s) WHERE rn = 1),
        |vs AS (SELECT vec_id, sup FROM (
        |    SELECT e.vec_id, s.sup,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_inner_product(e.vq, s.sv) /
        |          (sqrt(list_inner_product(e.vq, e.vq)) *
        |           sqrt(list_inner_product(s.sv, s.sv))) DESC, s.sup ASC) AS rn
        |    FROM e, ss s) WHERE rn <= 3),
        |s2 AS (
        |  SELECT e.vec_id, c.cell,
        |    list_inner_product(e.vq, c.cv) /
        |      (sqrt(list_inner_product(e.vq, e.vq)) *
        |       sqrt(list_inner_product(c.cv, c.cv))) AS sim
        |  FROM e JOIN vs ON vs.vec_id = e.vec_id JOIN cs c ON c.sup = vs.sup),
        |asg AS (SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
        |    FROM s2) WHERE rn <= 4),
        |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
        |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |edr AS (SELECT rep AS vec_id, CAST(embedding AS DOUBLE[]) AS v FROM g),
        |pairs AS (
        |  SELECT c.a, c.b
        |  FROM cand c JOIN edr ea ON ea.vec_id = c.a JOIN edr eb ON eb.vec_id = c.b
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3),
        |nb AS (SELECT gid, min(r) AS nr FROM (
        |  SELECT b AS gid, a AS r FROM pairs
        |  UNION ALL SELECT a AS gid, b AS r FROM pairs)
        |  GROUP BY gid)
        |SELECT g.rep AS vec_id FROM g LEFT JOIN nb ON nb.gid = g.rep
        |WHERE nb.nr IS NULL OR nb.nr > g.rep
        |ORDER BY vec_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
        | CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    // the image payloads are REAL codec bytes (javax.imageio); the
    // oracle can't run a PNG decoder, but it doesn't need to — dims
    // are id-derived and PNG is lossless, so the decoded pixel sum
    // must equal the generating formula, which SQL can recompute.
    // JPEG rows (odd ids) get NULL pix_sum: lossy reconstruction has
    // no formula to pin. A decoder that faked dims or dropped pixels
    // would hash-mismatch here.
    "mm_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
        |    CAST(8 + (doc_id * 7) % 40 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 13) % 40 AS BIGINT) AS height
        |  FROM documents)
        |SELECT media_id, media_type, width, height,
        |  CASE WHEN media_id % 2 = 0 THEN
        |    CAST(list_sum(flatten(list_transform(generate_series(0, width - 1),
        |      x -> list_transform(generate_series(0, height - 1),
        |        y -> (media_id * 31 + x * 17 + y * 29) % 256)))) AS BIGINT)
        |  ELSE NULL END AS pix_sum
        |FROM m ORDER BY media_id""".stripMargin,
    // replays the PCM generator formula; matching the Spark side —
    // which reads samples back out of real WAV containers — proves
    // the encode→container→decode round trip is lossless
    "mm_audio" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 400 + (doc_id % 5) * 100 AS n
        |  FROM documents),
        |s AS (SELECT media_id, n, unnest(range(n)) AS j FROM m),
        |v AS (
        |  SELECT media_id, n,
        |    (media_id * 7919 + j * 104729 + 12345) % 65536 - 32768 AS v
        |  FROM s)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST((n + 99) // 100 AS BIGINT) AS n_frames,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(CASE WHEN abs(v) < 1000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_silent
        |FROM v GROUP BY media_id, n ORDER BY media_id""".stripMargin,
    "mm_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id, doc_id AS base, FALSE AS flip
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, TRUE
        |  FROM documents WHERE doc_id % 10 = 0),
        |dims AS (
        |  SELECT media_id, base, flip,
        |    CAST(8 + (base * 7) % 40 AS BIGINT) AS w,
        |    CAST(8 + (base * 13) % 40 AS BIGINT) AS h
        |  FROM ids),
        |tot AS (
        |  SELECT media_id, w, h,
        |    list_sum(flatten(list_transform(generate_series(0, w - 1),
        |      x -> list_transform(generate_series(0, h - 1),
        |        y -> CASE WHEN flip AND x = 0 AND y = 0
        |              THEN ((base*31 + x*17 + y*29) % 256 + 128) % 256
        |              ELSE (base*31 + x*17 + y*29) % 256 END)))) AS tsum
        |  FROM dims),
        |cells AS (
        |  SELECT media_id, base, flip, w, h, i,
        |    ((i % 8) * w + 7) // 8 AS xlo, ((i % 8 + 1) * w + 7) // 8 - 1 AS xhi,
        |    ((i // 8) * h + 7) // 8 AS ylo, ((i // 8 + 1) * h + 7) // 8 - 1 AS yhi
        |  FROM dims, (SELECT unnest(generate_series(0, 59)) AS i)),
        |cstat AS (
        |  SELECT media_id, i,
        |    list_sum(flatten(list_transform(generate_series(xlo, xhi),
        |      x -> list_transform(generate_series(ylo, yhi),
        |        y -> CASE WHEN flip AND x = 0 AND y = 0
        |              THEN ((base*31 + x*17 + y*29) % 256 + 128) % 256
        |              ELSE (base*31 + x*17 + y*29) % 256 END)))) AS csum,
        |    (xhi - xlo + 1) * (yhi - ylo + 1) AS cpix
        |  FROM cells),
        |ph AS (
        |  SELECT c.media_id,
        |    CAST(sum(CASE WHEN c.csum * t.w * t.h > t.tsum * c.cpix
        |        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS phash
        |  FROM cstat c JOIN tot t USING (media_id)
        |  GROUP BY c.media_id),
        |bands AS (
        |  SELECT media_id, phash, bb, (phash >> (bb * 15)) & 32767 AS bkey
        |  FROM ph, (SELECT unnest([0, 1, 2, 3]) AS bb)),
        |cand AS (
        |  SELECT DISTINCT x.media_id AS a, y.media_id AS b,
        |    x.phash AS ha, y.phash AS hb
        |  FROM bands x JOIN bands y
        |    ON x.bb = y.bb AND x.bkey = y.bkey AND x.media_id < y.media_id)
        |SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY a, b""".stripMargin,
    // the sketch estimates are engine-specific, but the exact values
    // and the relative-error CONTRACT are not: the oracle pins the
    // booleans TRUE, so the row only hashes green if Spark's sketches
    // actually landed inside their bounds
    "sketch_approx" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  quantile_cont(l_extendedprice, 0.5) AS exact_median,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS median_within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // same contract pattern for the MERGEABLE sketches: the output
    // carries exact counts plus booleans the oracle pins TRUE —
    // est_within_5pct (HLL lgK=12 ≈ 1.6% σ, 5% = 3σ),
    // merge_within_5pct (estimate(union of per-group sketches) agrees
    // with estimate(one direct global sketch) within the same bound —
    // exact in sparse mode, ≤0.65% measured once dense), and the KLL
    // median's true rank within 0.5±0.05 (k=200 ≈ 1.65% rank error)
    "sketch_hll_merge" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
        |SELECT grp, exact_custs, TRUE AS est_within_5pct,
        |  TRUE AS merge_within_5pct
        |FROM g ORDER BY grp""".stripMargin,
    "sketch_kll_merge" ->
      """WITH g AS (
        |  SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', CAST(count(*) AS BIGINT) FROM lineitem)
        |SELECT grp, n, TRUE AS median_rank_within_5pct
        |FROM g ORDER BY grp""".stripMargin,
    // prefix-sum packing: exclusive cumsum over doc_id within each
    // source, integer-divided by the 512-token budget — replays the
    // Spark window bit-for-bit (no float division anywhere)
    "seq_pack_sql" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum0
        |  FROM toks)
        |SELECT source, CAST(cum0 // 512 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY source, bin
        |ORDER BY source, bin""".stripMargin,
    // length-bucketed batching: exact interpolated quartiles (the
    // sketch_approx quantile_cont == percentile precedent), md5-fold
    // shard, batches of 32 within (shard, bucket), per-batch padding
    // accounting
    "batch_pack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS n_tok,
        |    md5('batch:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |q AS (SELECT quantile_cont(n_tok, [0.25, 0.5, 0.75]) AS qs FROM toks),
        |b AS (
        |  SELECT doc_id, n_tok, k,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(k, 1, 8), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b) % 8 AS shard,
        |    CASE WHEN n_tok <= qs[1] THEN 0
        |         WHEN n_tok <= qs[2] THEN 1
        |         WHEN n_tok <= qs[3] THEN 2 ELSE 3 END AS bucket
        |  FROM toks CROSS JOIN q),
        |r AS (
        |  SELECT shard, bucket, n_tok,
        |    (row_number() OVER (PARTITION BY shard, bucket ORDER BY k, doc_id)
        |      - 1) // 32 AS batch
        |  FROM b)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(batch AS BIGINT) AS batch,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  max(n_tok) AS max_tok, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS padding_waste
        |FROM r GROUP BY 1, 2, 3 ORDER BY shard, bucket, batch""".stripMargin
    // no oracle (rows-only + ScalaTest verification) — 7 queries:
    //   dedup_minhash, dedup_simhash — xxhash64 family not in DuckDB
    //     (their md5 twins dedup_minhash_md5/dedup_simhash_md5 ARE
    //     oracle-checked end-to-end, covering both banding pipelines);
    //   sim_ann, sim_ivf — approximate by design (recall-tested vs
    //     the oracle-checked sim_topk; the md5 twin sim_ann_md5 and
    //     the sim_ann_recall/sim_ivf_recall contracts ARE oracle-
    //     checked);
    //   seq_pack, bpe_vocab, bpe_encode — sequential recurrences,
    //     exact-verified against single-node references (PackingSpec,
    //     BpeSpec); seq_pack's prefix-sum twin seq_pack_sql IS
    //     oracle-hash-checked.
  )
}
