package graft

import graft.operators._

/** Operators must degrade to empty results — never throw — on empty
  * tables: at scale, empty partitions, empty date slices, and freshly
  * created corpora are routine inputs. Builds a schema-identical empty
  * fixture dir and runs one representative per operator family.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty-sf").toString
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        spark.read.parquet(s"$sf/$t.parquet")
          .limit(0)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    dir
  }

  test("one representative per family returns 0 rows on an empty corpus") {
    val representatives: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "wordcount_alpha" -> (WordCount.alpha(_, _)),
      "q1_pricing"      -> ((s, d) => Relational.pricingSummary(s, d)),
      "join_q3_shipping" -> ((s, d) => Joins.shippingPriority(s, d)),
      "win_rank"        -> (Windows.rankPerCustomer(_, _)),
      "ts_sessionize"   -> (TimeSeries.sessionize(_, _)),
      "ts_fill"         -> (TimeSeries.gapFill(_, _)),
      "ts_anomaly"      -> ((s, d) => TimeSeries.anomalies(s, d)),
      "dedup_exact"     -> (Dedup.exact(_, _)),
      "dedup_spans"     -> ((s, d) => Dedup.spanDedup(s, d)),
      "dedup_span_regions" -> ((s, d) => Dedup.spanRegions(s, d)),
      "assoc_pairs"     -> (Cooccur.assocPairs(_, _)),
      "graph_pagerank"  -> (Cooccur.pagerank(_, _)),
      "sketch_cms"      -> ((s, d) => Relational.cmsTopK(s, d)),
      "stats_moments"   -> (Relational.statsMoments(_, _)),
      "text_entropy"    -> (TextAnalysis.charEntropy(_, _)),
      "mixture_temperature" -> ((s, d) => Curation.temperatureMix(s, d)),
      "retention_cohorts" -> (TimeSeries.retentionCohorts(_, _)),
      // r7 additions
      "weighted_sample" -> ((s, d) => Curation.weightedSample(s, d)),
      "heavy_hitters"   -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
      "colloc_pmi"      -> ((s, d) => TextAnalysis.collocPmi(s, d)),
      "mask_spans"      -> (TextAnalysis.maskSpans(_, _)),
      "contamination_bloom" -> ((s, d) => Curation.contaminationBloom(s, d)),
      "split_leak_free" -> (Curation.leakFreeSplit(_, _)),
      // r10 additions
      "train_shuffle" -> ((s, d) => Curation.trainShuffle(s, d)),
      "batch_pack"    -> ((s, d) => Packing.batchPack(s, d)),
      "corpus_diff"   -> ((s, d) => Curation.corpusDiff(s, d)),
      "source_datacard" -> ((s, d) => Curation.sourceDatacard(s, d)),
      "train_manifest" -> ((s, d) => Curation.trainManifest(s, d)),
      "mm_audio"      -> ((s, d) => Multimodal.audioFeatures(s, d)),
      // late-r11 additions
      "dsir_sample"   -> ((s, d) => Curation.dsirSample(s, d)),
      "ppl_buckets"   -> ((s, d) => TextAnalysis.pplBuckets(s, d)),
      "emb_outliers"  -> ((s, d) => Similarity.embOutliers(s, d)),
      "contamination_semantic" ->
        ((s, d) => Similarity.contaminationSemantic(s, d)),
      // trained-model / release operators
      "emb_pca"           -> ((s, d) => Models.embPca(s, d)),
      "domain_classifier" -> ((s, d) => Models.domainClassifier(s, d)),
      "dp_release"        -> ((s, d) => Curation.dpRelease(s, d)),
      "bm25_index_topk"   -> ((s, d) => TextAnalysis.bm25IndexTopK(s, d)),
      // r12 index-lifecycle additions
      "bm25_serve_topk"   -> ((s, d) => TextAnalysis.bm25ServeTopK(s, d)),
      "bm25_refresh"      -> ((s, d) => TextAnalysis.bm25Refresh(s, d)),
      "bm25_upsert_topk"  -> ((s, d) => TextAnalysis.bm25UpsertTopK(s, d)),
      "ivf_serve_topk"    -> ((s, d) => Similarity.ivfServeTopK(s, d)),
      "ivf_append_topk"   -> ((s, d) => Similarity.ivfAppendTopK(s, d)),
      // r13 additions
      "bm25_compact"      -> ((s, d) => TextAnalysis.bm25CompactTopK(s, d)),
      "ivf_append_recall" -> ((s, d) => Similarity.ivfAppendRecall(s, d)),
      "dedup_checkin"     -> ((s, d) => Dedup.neardupUpsert(s, d)),
      "dedup_checkin_removed" -> ((s, d) => Dedup.neardupUpsertRemoved(s, d)),
      "ivf_serve_removed" -> ((s, d) => Similarity.ivfServeRemoved(s, d)),
      "histogram_equidepth" -> (Relational.histogramEquidepth(_, _)),
      "ingest_pipeline"   -> ((s, d) => Curation.ingestPipeline(s, d)),
      // r14 additions
      "dedup_checkin_capped" -> ((s, d) => Dedup.neardupUpsertCapped(s, d)),
      "ivf_retrain_topk"  -> ((s, d) => Similarity.ivfRetrainTopK(s, d)),
      // r15 additions
      "ingest_pipeline2"  -> ((s, d) => Curation.ingestPipeline2(s, d)),
      "fold_trigger"      -> ((s, d) => Curation.foldTriggerContract(s, d)),
      "bm25_serve_asof"   -> ((s, d) => TextAnalysis.bm25ServeAsOfTopK(s, d)),
      "ivf_serve_asof"    -> ((s, d) => Similarity.ivfServeAsOf(s, d)),
      "dedup_lookup_asof" -> ((s, d) => Dedup.neardupLookupAsOfRow(s, d)),
      "index_health"      -> ((s, d) => Curation.indexHealth(s, d)),
      // r16 additions
      "maintain_estate"   -> ((s, d) => Curation.maintainEstate(s, d)),
      "manifest_pinned"   -> ((s, d) => Curation.manifestPinned(s, d)),
      "manifest_replay"   -> ((s, d) => Curation.manifestReplay(s, d)),
      "bm25_serve_asof_mid" -> ((s, d) => TextAnalysis.bm25ServeAsOfMidTopK(s, d)),
      "dedup_lookup_asof_mid" -> ((s, d) => Dedup.neardupLookupAsOfMidRow(s, d)),
      "ivf_serve_asof_mid" -> ((s, d) => Similarity.ivfServeAsOfMid(s, d)),
      "mm_ivf_lifecycle"  -> ((s, d) => Multimodal.mmIvfLifecycle(s, d)),
      // r17 additions
      "recovery_drill"    -> ((s, d) => Curation.recoveryDrill(s, d)),
      "train_read"        -> ((s, d) => Curation.trainRead(s, d)),
      "audio_ivf_lifecycle" -> ((s, d) => Multimodal.audioIvfLifecycle(s, d)),
      // r18 additions
      "bm25_snapshot_asof" -> ((s, d) => TextAnalysis.bm25SnapshotAsOf(s, d)),
      "estate_crash_drill" -> ((s, d) => Curation.estateCrashDrill(s, d)),
      "neardup_snapshot_asof" -> ((s, d) => Dedup.neardupSnapshotAsOf(s, d)),
      "ivf_snapshot_asof" -> ((s, d) => Similarity.ivfSnapshotAsOf(s, d)),
      "stream_index_ingest" ->
        ((s, d) => graft.streaming.Streaming.indexIngestContract(s, d)),
      // r19 addition
      "estate_snapshot_manifest" ->
        ((s, d) => Curation.estateSnapshotManifest(s, d)),
      // r20 addition
      "estate_stream_ingest" ->
        ((s, d) => Curation.estateStreamIngest(s, d)))
    val failures = representatives.flatMap { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        if (n != 0) Some(s"$name: $n rows from empty input") else None
      } catch {
        case e: Throwable =>
          Some(s"$name threw ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(100))
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** r12 verdict #8: the registry rows above exercise empty CORPORA;
    * the lifecycle APIs must also degrade on the other empty shapes —
    * empty DELTA against a populated base, and a populated delta
    * against an EMPTY base — without crashing, minting contentless
    * segments, or corrupting served rankings.
    */
  test("index lifecycle paths degrade on empty base or empty delta") {
    import graft.operators.{Similarity, TextAnalysis}
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("graft-empty-lifecycle").toString
    val docs = Seq((1L, "apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val noDocs = docs.limit(0)
    val q = Seq("apple", "banana", "cherry")
    def served(p: String) =
      TextAnalysis.bm25QueryIndex(spark, p, q, 10).collect().toSeq

    // empty delta on a populated base: refresh and append are both
    // no-ops — no segment minted, rankings byte-identical
    val idx = s"$root/idx"
    TextAnalysis.bm25WriteIndexDocs(spark, docs, idx)
    val before = served(idx)
    TextAnalysis.bm25RefreshIndex(spark, idx, noDocs, noDocs)
    assert(served(idx) == before, "empty-delta refresh changed rankings")
    assert(TextAnalysis.bm25AppendSegment(spark, idx, noDocs, noDocs).isEmpty,
      "empty delta minted a segment")
    assert(!new java.io.File(s"$idx/segments").exists,
      "empty-delta append created a segments dir")
    assert(served(idx) == before, "empty-delta append changed rankings")
    // compact with no segments: no-op, same rankings
    TextAnalysis.bm25Compact(spark, idx)
    assert(served(idx) == before, "segmentless compact changed rankings")

    // populated delta on an EMPTY base: both paths must yield an
    // index serving exactly the delta (== a from-scratch build)
    val want = {
      val d = s"$root/direct"
      TextAnalysis.bm25WriteIndexDocs(spark, docs, d)
      served(d)
    }
    val emptyRefresh = s"$root/emptyRefresh"
    TextAnalysis.bm25WriteIndexDocs(spark, noDocs, emptyRefresh)
    TextAnalysis.bm25RefreshIndex(spark, emptyRefresh, docs, noDocs)
    assert(served(emptyRefresh) == want,
      "refresh into an empty base != from-scratch build")
    val emptyAppend = s"$root/emptyAppend"
    TextAnalysis.bm25WriteIndexDocs(spark, noDocs, emptyAppend)
    assert(TextAnalysis.bm25AppendSegment(spark, emptyAppend, docs, noDocs).nonEmpty)
    assert(served(emptyAppend) == want,
      "segment append onto an empty base != from-scratch build")

    // IVF: append against an index built over an empty corpus (no
    // centroids — nothing to route to) must not crash, and the index
    // must still serve 0 rows
    val ivfIdx = s"$root/ivf"
    Similarity.ivfWriteIndexVecs(spark,
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).limit(0),
      ivfIdx)
    Similarity.ivfAppendVectors(spark, ivfIdx,
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).limit(4))
    assert(Similarity.ivfQueryIndex(spark, emptyDir, ivfIdx).count() == 0)
    // and an EMPTY append onto a populated index is a no-op
    val ivfIdx2 = s"$root/ivf2"
    Similarity.ivfWriteIndexVecs(spark,
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")), ivfIdx2)
    val servedBefore = Similarity.ivfQueryIndex(spark, sf, ivfIdx2).collect().toSeq
    Similarity.ivfAppendVectors(spark, ivfIdx2,
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).limit(0))
    assert(Similarity.ivfQueryIndex(spark, sf, ivfIdx2).collect().toSeq == servedBefore,
      "empty IVF append changed served results")
    // retrain over an EMPTY corpus at a path holding a populated,
    // tombstoned index (the r14 ivf_retrain_topk path's empty shape):
    // rebuild-means-rebuild even down to nothing — the old lists AND
    // tombstones vanish and the index serves 0 rows without crashing
    Similarity.ivfRemove(spark, ivfIdx2,
      Tables.embeddings(spark, sf).select(col("vec_id")).limit(2))
    Similarity.ivfWriteIndexVecs(spark,
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).limit(0),
      ivfIdx2)
    assert(Similarity.ivfQueryIndex(spark, sf, ivfIdx2).count() == 0,
      "empty-corpus retrain still serves rows")
  }

  /** An absent MODALITY (docs but no embeddings, or vice versa) must
    * not emit red contract rows for the missing family's indexes —
    * fold_trigger polices only the families whose corpus exists.
    */
  test("fold_trigger polices only the present modalities") {
    import org.apache.spark.sql.functions.col
    def mixedDir(withDocs: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-fold-mixed").toString
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      (if (withDocs) docs else docs.limit(0))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (if (withDocs) vecs.limit(0) else vecs)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val textOnly = Curation.foldTriggerContract(spark, mixedDir(true))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(textOnly.map(_._1).forall(m =>
      m.startsWith("bm25_") || m.startsWith("nd_")),
      s"docs-only corpus emitted non-text rows: ${textOnly.map(_._1)}")
    assert(textOnly.size == 9 && textOnly.forall(_._2),
      s"docs-only families not all green: $textOnly")
    val healthTextOnly = Curation.indexHealth(spark, mixedDir(true))
      .collect().map(_.getString(0))
    assert(healthTextOnly.nonEmpty && healthTextOnly.forall(m =>
      m.startsWith("bm25_") || m.startsWith("nd_")),
      s"docs-only health emitted non-text rows: ${healthTextOnly.toSeq}")
    val vecOnly = Curation.foldTriggerContract(spark, mixedDir(false))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(vecOnly.map(_._1).forall(_.startsWith("ivf_")),
      s"embeddings-only corpus emitted non-ivf rows: ${vecOnly.map(_._1)}")
    assert(vecOnly.size == 5 && vecOnly.forall(_._2),
      s"embeddings-only family not all green: $vecOnly")
    // maintenance has the same per-modality shape: a docs-only corpus
    // maintains the two text families, an embeddings-only corpus only
    // the vector family — all rows green either way
    val maintTextOnly = Curation.maintainEstate(spark, mixedDir(true))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(maintTextOnly.map(_._1).forall(m =>
      m.startsWith("est_bm25_") || m.startsWith("est_nd_")),
      s"docs-only maintenance emitted non-text rows: ${maintTextOnly.map(_._1)}")
    assert(maintTextOnly.size == 5 && maintTextOnly.forall(_._2),
      s"docs-only maintenance not all green: $maintTextOnly")
    val maintVecOnly = Curation.maintainEstate(spark, mixedDir(false))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(maintVecOnly.map(_._1).forall(_.startsWith("est_ivf_")),
      s"embeddings-only maintenance emitted non-ivf rows: ${maintVecOnly.map(_._1)}")
    assert(maintVecOnly.size == 3 && maintVecOnly.forall(_._2),
      s"embeddings-only maintenance not all green: $maintVecOnly")
    // the pinned manifest records gens only for the present families;
    // the replay proves only those families' pins
    val pinVecOnly = Curation.manifestPinned(spark, mixedDir(false))
      .collect().filter(_.getString(0) == "index_gen").map(_.getString(1))
    assert(pinVecOnly.toSeq == Seq("ivf"),
      s"embeddings-only manifest pinned wrong families: ${pinVecOnly.toSeq}")
    val replayVecOnly = Curation.manifestReplay(spark, mixedDir(false))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(replayVecOnly.map(_._1).forall(_.startsWith("mr_ivf_")) &&
      replayVecOnly.size == 2 && replayVecOnly.forall(_._2),
      s"embeddings-only replay wrong: $replayVecOnly")
    // the recovery drill has the same per-modality shape
    val drillTextOnly = Curation.recoveryDrill(spark, mixedDir(true))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(drillTextOnly.map(_._1).forall(m =>
      m.startsWith("rd_bm25_") || m.startsWith("rd_nd_")),
      s"docs-only drill emitted non-text rows: ${drillTextOnly.map(_._1)}")
    assert(drillTextOnly.size == 12 && drillTextOnly.forall(_._2),
      s"docs-only drill not all green: $drillTextOnly")
    val drillVecOnly = Curation.recoveryDrill(spark, mixedDir(false))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(drillVecOnly.map(_._1).forall(_.startsWith("rd_ivf_")) &&
      drillVecOnly.size == 6 && drillVecOnly.forall(_._2),
      s"embeddings-only drill wrong: $drillVecOnly")
    // the mid-estate crash drill needs BOTH families (one family
    // crashing beside another is the point): either-only emits none
    assert(Curation.estateCrashDrill(spark, mixedDir(true)).count() == 0,
      "docs-only estate crash drill emitted rows")
    assert(Curation.estateCrashDrill(spark, mixedDir(false)).count() == 0,
      "embeddings-only estate crash drill emitted rows")
    // the composed stream-ingest drill likewise needs all three
    // families live: either modality absent emits no rows
    assert(Curation.estateStreamIngest(spark, mixedDir(true)).count() == 0,
      "docs-only estate stream ingest emitted rows")
    assert(Curation.estateStreamIngest(spark, mixedDir(false)).count() == 0,
      "embeddings-only estate stream ingest emitted rows")
    // the consumer row: docs-only corpus reads shards + the two text
    // retrievals; embeddings-only reads only the ivf retrieval (no
    // documents → no shards to verify)
    val readTextOnly = Curation.trainRead(spark, mixedDir(true))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(readTextOnly.map(_._1).forall(m =>
      m.startsWith("tr_shard_") || m == "tr_bm25_reproduced" ||
        m == "tr_nd_reproduced"),
      s"docs-only train_read emitted ivf rows: ${readTextOnly.map(_._1)}")
    assert(readTextOnly.exists(_._1.startsWith("tr_shard_")) &&
      readTextOnly.forall(_._2),
      s"docs-only train_read not all green: $readTextOnly")
    val readVecOnly = Curation.trainRead(spark, mixedDir(false))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toSeq
    assert(readVecOnly.map(_._1) == Seq("tr_ivf_reproduced") &&
      readVecOnly.forall(_._2),
      s"embeddings-only train_read wrong: $readVecOnly")
  }
}
