package graft

import graft.operators.{Cooccur, Dedup, TimeSeries}
import org.apache.spark.sql.functions._

/** Co-occurrence family + the round-6 additions (span dedup, gap
  * fill): semantic invariants and the plan shapes the 100 TB posture
  * depends on. All four queries are also oracle-hash-checked by the
  * driver; these tests pin the properties a hash can't see.
  */
class CooccurSpec extends SparkSpec {

  test("assoc_pairs broadcasts the item-frequency side and bounds confidence") {
    val df = Cooccur.assocPairs(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"freq side not broadcast:\n$plan")
    // pair generation is map-side array expansion, not a self-join:
    // exactly the one broadcast join (freq), zero shuffled joins
    assert(plan.contains("Generate explode"), s"no map-side pair expansion:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"unexpected shuffled self-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (pairCnt, cntA) = (r.getLong(2), r.getLong(3))
      val conf = r.getDouble(5)
      assert(a < b, s"pair not ordered: $a,$b")
      assert(pairCnt <= cntA, "co-occurrence exceeds item support")
      assert(conf > 0 && conf <= 1.0, s"confidence out of range: $conf")
    }
  }

  test("graph_pagerank conserves rank mass on the symmetric graph") {
    val df = Cooccur.pagerank(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    // symmetric graph → no dangling mass: total rank stays 1 up to the
    // final per-node rank_x1000 rounding (6 decimals → ±5e-10 rank each)
    val total = df.agg(sum(col("rank_x1000"))).head.getDouble(0) / 1000.0
    assert(math.abs(total - 1.0) < n * 5e-10 + 1e-9, s"rank mass drifted: $total")
    assert(df.filter(col("rank_x1000") <= 0).count() == 0, "non-positive rank")
    df.unpersist()
  }

  test("dedup_spans matches a single-node reference on the fixture corpus") {
    import scala.collection.mutable
    val got = Dedup.spanDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // naive reference: slide the same 40/10 windows driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(regexp_replace(col("text"), "\\s+", " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hits = mutable.Map.empty[String, mutable.ArrayBuffer[Long]]
    for ((id, n) <- docs if n.length >= 40; p <- 0 to (n.length - 40) by 10)
      hits.getOrElseUpdate(md5hex(n.substring(p, p + 40)), mutable.ArrayBuffer()) += id
    val want = hits.collect { case (h, ids) if ids.distinct.size >= 2 =>
      (h, ids.distinct.size.toLong, ids.size.toLong, ids.min)
    }.toSet
    assert(got == want, s"span sets differ: got ${got.size}, want ${want.size}")
  }

  test("dedup_spans shuffles digests, not text: explode sits below the exchange") {
    val plan = Dedup.spanDedup(spark, sf).queryExecution.executedPlan.toString
    val gen = plan.indexOf("Generate")
    val exch = plan.indexOf("Exchange hashpartitioning(span_md5")
    assert(gen >= 0, s"no Generate in plan:\n$plan")
    assert(exch >= 0, s"no span_md5 exchange in plan:\n$plan")
    // treeString is top-down: the exchange must appear ABOVE the
    // explode, i.e. windows are hashed map-side and only digests move
    assert(exch < gen, s"explode above exchange:\n$plan")
  }

  test("dedup_span_regions is consistent with dedup_spans and bounded by doc length") {
    val regions = Dedup.spanRegions(spark, sf).collect()
    assert(regions.nonEmpty)
    regions.foreach { r =>
      val (nReg, dupChars, docChars, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nReg >= 1)
      assert(dupChars >= 40 && dupChars <= docChars,
        s"dup_chars $dupChars out of range for doc_chars $docChars")
      assert(ratio > 0, s"ratio $ratio")
    }
    // every doc with a duplicated span appears; docs without don't
    val spanDocs = Dedup.spanDedup(spark, sf)
      .select(org.apache.spark.sql.functions.col("first_doc")).collect()
      .map(_.getLong(0)).toSet
    val regionDocs = regions.map(_.getLong(0)).toSet
    assert(spanDocs.subsetOf(regionDocs),
      s"first_doc of a dup span missing from regions: ${spanDocs -- regionDocs}")
  }

  test("profile_stats: per-column scans stay pruned to exactly their column") {
    // r21: the single fused scan planned as a 4×-expanded
    // Sort+SortAggregate over all profiled columns (measured 5×
    // slower than the split form) — the query now runs one
    // column-pruned scan per distinct count plus the base min/max
    // scan. The pin is what makes the trade sound at 100 TB: each
    // extra scan must read exactly ONE column (columnar pruning), so
    // total bytes read stay ~those of the one wide scan.
    val df = graft.operators.Relational.profileStats(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.size == 4, s"expected 4 lineitem scans, got $reads:\n$plan")
    val single = reads.filter(_.split(",").length == 1)
    assert(single.size == 3,
      s"expected 3 single-column distinct scans, got $reads")
    assert(df.count() == 3)
  }

  test("ts_anomaly flags exactly the rows whose rounded |z| exceeds the threshold") {
    val rows = TimeSeries.anomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    var anomalies = 0
    rows.foreach { r =>
      val (z, flag) = (r.getDouble(3), r.getBoolean(4))
      assert(flag == (math.abs(z) > 2.5), s"flag/z mismatch: $r")
      if (flag) anomalies += 1
    }
    // z-scores against a trailing baseline: anomalies must be the tail,
    // not the norm
    assert(anomalies > 0 && anomalies < rows.length / 5,
      s"$anomalies anomalies out of ${rows.length}")
  }

  test("ts_fill densifies every series and interpolates inside observed bounds") {
    val df = TimeSeries.gapFill(spark, sf).cache()
    assert(df.filter(col("v_filled").isNull).count() == 0, "null after fill")
    // grid completeness: per type, rows == hours between min and max + 1
    val spans = df.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        min("hour_start").as("h0"), max("hour_start").as("h1"))
      .withColumn("hours",
        (unix_timestamp(col("h1"), "yyyy-MM-dd HH:mm:ss") -
         unix_timestamp(col("h0"), "yyyy-MM-dd HH:mm:ss")) / 3600 + 1)
      .collect()
    spans.foreach(r => assert(r.getAs[Long]("rows").toDouble == r.getAs[Double]("hours"),
      s"grid gap for ${r.getString(0)}: ${r.getAs[Long]("rows")} vs ${r.getAs[Double]("hours")}"))
    // boundary rows are observed, never interpolated
    val edges = df.groupBy("event_type").agg(
      min(struct(col("hour_start"), col("filled"))).as("lo"),
      max(struct(col("hour_start"), col("filled"))).as("hi"))
    edges.collect().foreach { r =>
      assert(r.getStruct(1).getLong(1) == 0L, "first grid hour was filled")
      assert(r.getStruct(2).getLong(1) == 0L, "last grid hour was filled")
    }
    df.unpersist()
  }
}
