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

  test("train_shuffle: exact permutation, dense per-shard positions, seeded") {
    val nDocs = Tables.documents(spark, sf).count()
    val rows = Curation.trainShuffle(spark, sf)
      .select(col("shard"), col("pos"), col("doc_id"))
      .as[(Long, Long, Long)].collect()
    // every document exactly once
    assert(rows.length == nDocs)
    assert(rows.map(_._3).distinct.length == nDocs)
    // positions are dense 0..n-1 within every shard
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.sameElements(0L until rs.length),
        s"shard $shard positions not dense")
    }
    // shards are reasonably balanced (md5 uniformity): no shard more
    // than 2x the mean at fixture sizes
    val sizes = rows.groupBy(_._1).values.map(_.length)
    assert(sizes.max <= 2.0 * nDocs / sizes.size)
    // deterministic: same seed reproduces the permutation exactly
    val again = Curation.trainShuffle(spark, sf)
      .select(col("shard"), col("pos"), col("doc_id"))
      .as[(Long, Long, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._2)).sameElements(again.sortBy(r => (r._1, r._2))))
    // a different seed is a DIFFERENT permutation of the same docs
    val ep2 = Curation.trainShuffle(spark, sf, seed = "ep2")
      .select(col("shard"), col("pos"), col("doc_id"))
      .as[(Long, Long, Long)].collect()
    assert(ep2.map(_._3).sorted.sameElements(rows.map(_._3).sorted))
    assert(!ep2.sortBy(r => (r._1, r._2)).map(_._3)
      .sameElements(rows.sortBy(r => (r._1, r._2)).map(_._3)))
  }

  test("batch_pack: batch size respected, padding accounting exact, full coverage") {
    val nDocs = Tables.documents(spark, sf).count()
    val rows = graft.operators.Packing.batchPack(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._4).sum == nDocs) // every doc in exactly one batch
    rows.foreach { case (shard, bucket, batch, n, maxTok, sumTok, waste) =>
      assert(n >= 1 && n <= 32, s"batch ($shard,$bucket,$batch) size $n")
      assert(waste == n * maxTok - sumTok, "padding accounting broken")
      assert(waste >= 0 && sumTok <= n * maxTok)
    }
    // within a (shard, bucket), only the LAST batch may be partial
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      val partial = rs.filter(_._4 < 32).map(_._3)
      assert(partial.length <= 1 && partial.forall(_ == rs.map(_._3).max),
        s"group $k has a non-terminal partial batch")
    }
    // bucketing earns its keep: total padding waste is below batching
    // in bare shuffle-key order within shards (no length buckets) —
    // the unbucketed reference rebuilt inline with the same keys
    val waste = rows.map(_._7).sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("k", "doc_id")
    val unbucketed = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFns.nTokens(col("text")).cast("long").as("n_tok"),
        md5(concat(lit("batch:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 8), 16, 10).cast("long"), lit(8L)))
      .withColumn("batch", expr(
        "(row_number() over (partition by shard order by k, doc_id) - 1) div 32"))
      .groupBy(col("shard"), col("batch"))
      .agg((count(lit(1)) * max(col("n_tok")) - sum(col("n_tok"))).as("waste"))
      .agg(sum(col("waste"))).as[Long].head()
    // fixture-pinned expectation, NOT a mathematical guarantee:
    // quartile bucketing is not never-worse for arbitrary length
    // distributions (partial-batch boundaries can flip the sign), it
    // just wins on anything length-skewed. The 10% headroom keeps the
    // test meaningful (bucketing still has to roughly win) without
    // flaking if testdata is regenerated with a different distribution.
    assert(waste <= unbucketed * 1.1,
      s"bucketed waste $waste > 1.1x unbucketed $unbucketed")
  }

  test("corpus_diff statuses reconcile with the version-derivation rules") {
    val rows = Curation.corpusDiff(spark, sf).as[(String, String, Long)].collect()
    assert(rows.map(_._2).toSet == Set("added", "removed", "changed", "unchanged"))
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val ids = Tables.documents(spark, sf)
      .select(col("doc_id")).as[Long].collect()
    val inV1 = (id: Long) => id % 30 != 0
    val inV2 = (id: Long) => id % 30 != 7
    assert(byStatus("added") == ids.count(id => inV2(id) && !inV1(id)))
    assert(byStatus("removed") == ids.count(id => inV1(id) && !inV2(id)))
    assert(byStatus("changed") ==
      ids.count(id => inV1(id) && inV2(id) && id % 20 == 0))
    assert(byStatus("unchanged") ==
      ids.count(id => inV1(id) && inV2(id) && id % 20 != 0))
  }

  test("source_datacard reconciles against a driver-side recompute") {
    val rows = Curation.sourceDatacard(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, String, Long)].collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("lang"), col("text"))
      .as[(String, String, String)].collect()
    assert(rows.map(_._1).toSet == docs.map(_._1).toSet)
    rows.foreach { case (src, nDocs, _, _, dup, nLangs, topLang, _) =>
      val ds = docs.filter(_._1 == src)
      assert(nDocs == ds.length)
      assert(dup == ds.length - ds.map(_._3).distinct.length)
      assert(nLangs == ds.map(_._2).distinct.length)
      // dominant lang, ties broken toward the lexicographically LATER
      // lang (struct-max compares (count, lang))
      val best = ds.groupBy(_._2).view.mapValues(_.length).toSeq
        .maxBy { case (l, n) => (n, l) }._1
      assert(topLang == best, s"$src: $topLang != $best")
    }
  }

  test("source_datacard dup_docs counts real duplicates (synthetic corpus)") {
    // the shipped fixtures have zero intra-source exact duplicates, so
    // the oracle gate can't falsify dup_docs — exercise it on a tiny
    // corpus with KNOWN duplicate structure instead
    val dir = java.nio.file.Files
      .createTempDirectory("graft-datacard-dup").toString
    Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta gamma", "en", "web", 16L),  // dup of 1
      (3L, "alpha beta gamma", "en", "web", 16L),  // dup of 1
      (4L, "unique text here", "de", "web", 16L),
      (5L, "other doc", "en", "books", 9L),
      (6L, "other doc", "en", "books", 9L)         // dup of 5
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Curation.sourceDatacard(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows("web")._5 == 2, s"web dup_docs ${rows("web")._5} != 2")
    assert(rows("books")._5 == 1)
    assert(rows("web")._6 == 2 && rows("web")._7 == "en") // 2 langs, en dominant
    assert(rows("books")._6 == 1)
  }

  test("train_manifest composes gate/dedup/split/shard faithfully") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // independent driver-side replay of the four stages
    val gated = docs.map { case (id, t) =>
      (id, t, t.split("\\s+").count(_.nonEmpty).toLong)
    }.filter(_._3 >= 20)
    val kept = gated.groupBy(r => md5hex(r._2)).values.map(_.minBy(_._1)).toSeq
    val train = kept.filter(r => md5hex(s"split:${r._1}").head <= 'b')
    val sharded = train.map { r =>
      val shard = java.lang.Long.parseLong(
        md5hex(s"shuffle:ep1:${r._1}").take(8), 16) % 16
      (shard, r._1, r._3)
    }
    val expect = sharded.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.length.toLong, rs.map(_._3).sum, rs.map(_._2).min, rs.map(_._2).max)
    }
    val rows = Curation.trainManifest(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == expect.size)
    rows.foreach { case (s, n, tok, lo, hi) =>
      assert(expect(s) == ((n, tok, lo, hi)), s"shard $s manifest diverges")
    }
    // and the funnel actually gates/dedups something on the fixture
    assert(gated.length < docs.length || kept.size < gated.length ||
      train.size < kept.size)
  }

  test("dsir_sample: budget-sized, raw-only, deterministic, target-shifted") {
    val rows = Curation.dsirSample(spark, sf)
      .as[(Long, Long, String, Double)].collect()
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1L to 100L), "dense ranks")
    assert(rows.map(_._2).distinct.length == 100, "no doc sampled twice")
    assert(rows.forall(_._3 != "src0"), "target-domain docs never selected")
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq,
      "keys descend with rank")
    val again = Curation.dsirSample(spark, sf)
      .as[(Long, Long, String, Double)].collect()
    assert(rows.sameElements(again), "md5-derived draw is a pure function")
    // the importance weights must actually steer the draw: with w
    // constant, the Gumbel top-k degenerates to ranking by noise
    // alone. Recompute that noise-only top-100 here (same md5 uniform)
    // and assert the DSIR selection differs — falsifiable evidence the
    // log-ratio term participates in the key.
    val md = java.security.MessageDigest.getInstance("MD5")
    def gumbel(docId: Long): Double = {
      val hex = md.digest(s"dsir:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      -math.log(-math.log(u))
    }
    val noiseOnly = Tables.documents(spark, sf)
      .filter(col("source") =!= "src0")
      .select("doc_id").as[Long].collect()
      .sortBy(id => (-gumbel(id), id)).take(100).sorted
    assert(!rows.map(_._2).sorted.sameElements(noiseOnly),
      "selection must differ from the weight-free Gumbel draw")
  }

  test("ppl_buckets: full coverage, tercile balance, ordered tiers per lang") {
    val docs = Tables.documents(spark, sf).count()
    val rows = graft.operators.TextAnalysis.pplBuckets(spark, sf)
      .as[(Long, String, Double, String)].collect()
    assert(rows.length == docs, "every document bucketed")
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byB = rs.groupBy(_._4).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(byB.getOrElse(_, 0))
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: $sizes")
      // ntile over (score desc): every head score >= every middle
      // score >= every tail score within the language
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      for ((hi, lo) <- Seq(("head", "middle"), ("middle", "tail"))
           if scores(hi).nonEmpty && scores(lo).nonEmpty)
        assert(scores(hi).min >= scores(lo).max, s"$lang $hi/$lo overlap")
    }
  }

  test("dp_release: released value == true count + analytic md5-Laplace noise") {
    import java.security.MessageDigest
    def laplace(key: String, scale: Double): Double = {
      val hex = MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val v = java.lang.Long.parseLong(hex, 16)
      val u = (v.toDouble + 0.5) / 4503599627370496.0 // 2^52
      val c = u - 0.5
      -math.signum(c) * scale * math.log(1.0 - 2.0 * math.abs(c))
    }
    val rows = Curation.dpRelease(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val truth = Tables.documents(spark, sf)
      .select(col("lang"),
        least(graft.functions.TextFns.nTokens(col("text")).cast("long"),
          lit(100L)).as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("d"), sum(col("t")).as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (lang, eps, nd, nt) =>
      assert(eps == 1.0)
      val (td, tt) = truth(lang)
      // the replay prepends the (test-only default) seed — r12's
      // seedable mechanism
      val wantD = BigDecimal(td + laplace(s"REPLAY-FIXTURE-SEED:dpd:$lang", 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val wantT = BigDecimal(tt + laplace(s"REPLAY-FIXTURE-SEED:dpt:$lang", 100.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(nd - wantD) < 1e-9, s"$lang docs: $nd vs $wantD")
      assert(math.abs(nt - wantT) < 1e-9, s"$lang toks: $nt vs $wantT")
      // the noise is nonzero (a zero draw would mean no privacy at all)
      assert(nd != td.toDouble && nt != tt.toDouble, s"$lang: zero noise")
    }
  }

  test("two-round ingest gate: a doc near-dup ONLY of a rejected doc is admitted") {
    // the discriminating case the ingest_pipeline2 registry fixture
    // cannot produce naturally (a verbatim copy of a rejected doc is
    // also a near-dup of whatever caused the rejection): r is
    // rejected against x in round 1, r2 overlaps ONLY r's novel tail
    // — correct reference set (v1 ∪ survivors) admits r2; a gate that
    // wrongly indexed rejected docs would reject it. The corpus is
    // FOUND by a plain-Scala replica of the md5 family (banding at
    // J≈0.25 collides rarely; the search is in-memory md5 only, and
    // the family is deterministic so the found corpus stays valid).
    import graft.operators.Dedup
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fam(text: String): (Set[Long], Set[String]) = {
      val mask = (1L << 48) - 1
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val hs = toks.sliding(3).filter(_.size == 3).map(_.mkString(" "))
        .toSeq.distinct.map { s =>
          val h = md5Hex(s)
          (java.lang.Long.parseLong(h.substring(0, 12), 16),
            java.lang.Long.parseLong(h.substring(12, 24), 16))
        }
      val sig = (0 until 16).map(i =>
        hs.map { case (h1, h2) => (h1 + i * h2) & mask }.min)
      ((hs.map(_._1).toSet,
        (0 until 4).map(bd => bd + "|" + md5Hex(
          (0 until 4).map(r => sig(bd * 4 + r)).mkString("|"))).toSet))
    }
    def jac(a: Set[Long], b: Set[Long]): Double =
      a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)
    val x = (1 to 30).map(i => s"w$i").mkString(" ")
    val (sx, bx) = fam(x)
    val found = (0 until 256).iterator.map { i =>
      val tail = (1 to 12).map(j => s"t${i}q$j").mkString(" ")
      (s"$x $tail", tail + " " + (1 to 3).map(j => s"n${i}z$j").mkString(" "))
    }.find { case (r, r2) =>
      val (sr, br) = fam(r); val (s2, b2) = fam(r2)
      bx.intersect(br).nonEmpty && jac(sx, sr) >= 0.2 &&
      br.intersect(b2).nonEmpty && jac(sr, s2) >= 0.2 &&
      jac(sx, s2) < 0.2 && bx.intersect(b2).isEmpty
    }
    assert(found.nonEmpty, "no colliding corpus in the search budget")
    val (r, r2) = found.get
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ingest2-gate").toString + "/idx"
    Dedup.neardupWriteIndex(spark, Seq((1L, x)).toDF("doc_id", "text"), idx)
    // round 1: r rejected against v1 — and therefore NOT checked in
    val p1 = Dedup.neardupLookup(spark, idx, Seq((10L, r)).toDF("doc_id", "text"))
      .collect()
    assert(p1.nonEmpty, "fixture broke: r not rejected in round 1")
    // round 2 against v1 ∪ survivors (= v1 alone): r2 must be ADMITTED
    val p2 = Dedup.neardupLookup(spark, idx, Seq((20L, r2)).toDF("doc_id", "text"))
      .collect()
    assert(p2.isEmpty,
      s"r2 rejected against a reference set that must not contain r: ${p2.toSeq}")
    // contrast: had the gate wrongly indexed the REJECTED r, r2
    // would be rejected — the two outcomes differ exactly on the
    // reference-set semantics
    Dedup.neardupCheckIn(spark, idx, Seq((10L, r)).toDF("doc_id", "text"))
    val p3 = Dedup.neardupLookup(spark, idx, Seq((20L, r2)).toDF("doc_id", "text"))
      .collect()
    assert(p3.nonEmpty, "contrast leg broke: r2 no longer pairs with r")
  }

  test("estate_stream_ingest pins hold on first AND warm invocations") {
    // the bench drives each registry row repeatedly in one JVM: the
    // warm path re-copies fresh estates over the previous invocation's
    // mutated dirs and re-arms the one-shot crashes — the pins must
    // hold identically (a leaked watermark or un-wiped index would
    // break the batch-0 or inconsistency pins immediately)
    (1 to 2).foreach { pass =>
      val got = Curation.estateStreamIngest(spark, sf).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toSeq
      assert(got.size == 9 && got.forall(_._2),
        s"pass $pass not all green: ${got.filterNot(_._2).map(_._1)}")
    }
  }
}
