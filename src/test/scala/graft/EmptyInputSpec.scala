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
      "ivf_append_topk"   -> ((s, d) => Similarity.ivfAppendTopK(s, d)))
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
}
