package graft

import graft.operators.Curation
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel: monotone per source, shares sum to 1, dedup consistent") {
    val rows = Curation.curatePipeline(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nGated, nKept, toksKept, share) =>
      assert(nKept <= nGated && nGated <= nDocs, s"$src funnel not monotone")
      assert((nKept == 0) == (toksKept == 0), s"$src token/doc mismatch")
      assert(share >= 0.0 && share <= 1.0)
    }
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4, "shares must sum to 1")
    // total kept docs == distinct gated texts (the dedup stage's contract)
    val gated = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 80 &&
        graft.functions.TextFns.nTokens(col("text")) >= 20)
    val distinctTexts = gated.select(md5(col("text"))).distinct().count()
    assert(rows.map(_._4).sum == distinctTexts)
  }

  test("stratified sample: exactly min(n, group size) per group, deterministic") {
    val n = 50
    val sizes = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val s1 = Curation.stratifiedSample(spark, sf, n)
      .as[(String, Long, Long)].collect()
    val s2 = Curation.stratifiedSample(spark, sf, n)
      .as[(String, Long, Long)].collect()
    assert(s1.sameElements(s2))
    val perGroup = s1.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    sizes.foreach { case (lang, sz) =>
      assert(perGroup.getOrElse(lang, 0L) == math.min(n.toLong, sz),
        s"$lang quota")
    }
    // ranks are 1..quota with no gaps, per group
    s1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("temperature mixture: quotas track n^0.5, fill the budget, upweight the tail") {
    val budget = 150
    val rows = Curation.temperatureMix(spark, sf, budget)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val sizes = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val quotas = rows.groupBy(_._1).view.mapValues(_.head._4).toMap
    val picked = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // each language fills exactly its quota (quota ≤ size by least())
    quotas.foreach { case (lang, q) =>
      assert(picked(lang) == q, s"$lang picked ${picked(lang)} != quota $q")
      assert(q <= sizes(lang), s"$lang quota above corpus size")
    }
    // budget is met up to per-language rounding (±1 each)
    val total = quotas.values.sum
    assert(math.abs(total - budget) <= quotas.size, s"total quota $total vs $budget")
    // α=0.5 flattens the mixture: the smallest language's sampled share
    // strictly exceeds its raw corpus share
    val nTotal = sizes.values.sum.toDouble
    val (minLang, minSz) = sizes.minBy(_._2)
    assert(quotas(minLang) / total.toDouble > minSz / nTotal,
      s"$minLang not upweighted: ${quotas(minLang)}/$total vs $minSz/$nTotal")
  }

  test("semantic keep-list: partitions the corpus with near-dup drops; id 0 kept") {
    val all = Tables.embeddings(spark, sf).select("vec_id").as[Long].collect().toSet
    val kept = Similarity.semanticKeep(spark, sf).as[Long].collect().toSet
    val dropped = all.diff(kept)
    assert(kept.contains(0L)) // the smallest id can never duplicate a lower one
    // every dropped vector really is near a lower-id vector
    val pairs = Similarity.embeddingNearDup(spark, sf)
      .select("b").as[Long].collect().toSet
    assert(dropped == pairs)
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val exact = Curation.benchmarkContamination(spark, sf).collect()
      .map(_.toString).toSeq
    val bloom = Curation.contaminationBloom(spark, sf).collect()
      .map(_.toString).toSeq
    assert(bloom == exact) // FPs must die in the verify join
    assert(exact.nonEmpty)
  }

  test("leak-free split: no exact-duplicate cluster straddles splits") {
    val rows = Curation.leakFreeSplit(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    // every doc in a cluster carries its representative's split
    val repSplit = rows.map(r =>
      r.getAs[Long]("rep") -> r.getAs[String]("split")).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("split") == repSplit(r.getAs[Long]("rep")))
      assert(r.getAs[Long]("rep") <= r.getAs[Long]("doc_id"))
    }
    // the split follows the SAME hash contract as sample_split, keyed
    // on the representative: a singleton cluster's split matches what
    // sampleSplit's hex-digit rule assigns its doc_id
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }
}
