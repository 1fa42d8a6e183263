package graft.tools

import graft.Sessions

/** Splits bm25_index_topk's cost into BUILD (index write) vs SERVE
  * (partition-pruned query) at a given SF dir — the number that
  * matters at scale is the serve, since the build runs once at
  * ingest. Usage: runMain graft.tools.Bm25Probe <sfDir> [deltaCap]
  *
  * r13 (r12 verdict #3): the optional `deltaCap` bounds the delta to
  * doc_id < cap. The default fixture delta is ~13% of docs and grows
  * WITH the corpus, so its slope rows conflate delta growth with
  * corpus growth; passing the 1× corpus's doc_id domain size as the
  * cap on a ScaleUp-derived N× dir (replica 0 occupies exactly that
  * id range) applies a FIXED-size delta to a growing corpus — the
  * measurement that separates O(delta) from O(corpus).
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cap = if (args.length > 1) args(1).toLong else Long.MaxValue
    val spark = Sessions.local("graft-bm25-probe")
    val idx = s"/tmp/graft_bm25_probe_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val terms = Seq("data", "model", "system")
    val t0 = System.nanoTime()
    graft.operators.TextAnalysis.bm25WriteIndex(spark, dir, idx)
    val t1 = System.nanoTime()
    (1 to 3).foreach { i =>
      val s0 = System.nanoTime()
      val n = graft.operators.TextAnalysis
        .bm25QueryIndex(spark, idx, terms, 20).count()
      println(f"BM25 serve run$i: ${(System.nanoTime() - s0) / 1e9}%.2f s rows=$n")
    }
    println(f"BM25 build: ${(t1 - t0) / 1e9}%.2f s")
    // r12: incremental-refresh cost vs the full rebuild it replaces —
    // the corpus_diff-fixture delta (~8% of docs) merged into the
    // just-built index. The refresh should cost O(delta + touched
    // postings) regardless of corpus size; the rebuild is the build
    // number above.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val v2 = docs.filter(pmod(col("doc_id"), lit(30)) =!= 7)
    val d1 = docs.filter(pmod(col("doc_id"), lit(30)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(20)) === 0,
          concat(lit("v1:"), col("text"))).otherwise(col("text")).as("text"))
    val oldD = d1.join(v2.select(col("doc_id"), md5(col("text")).as("d2")),
        Seq("doc_id"), "left")
      .filter(col("d2").isNull || md5(col("text")) =!= col("d2"))
      .filter(col("doc_id") < cap)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val newD = v2.join(d1.select(col("doc_id"), md5(col("text")).as("dd")),
        Seq("doc_id"), "left")
      .filter(col("dd").isNull || md5(col("text")) =!= col("dd"))
      .filter(col("doc_id") < cap)
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"BM25 delta: old=${oldD.count()} new=${newD.count()} " +
      s"of ${docs.count()} docs")
    val r0 = System.nanoTime()
    graft.operators.TextAnalysis.bm25RefreshIndex(spark, idx, newD, oldD)
    println(f"BM25 refresh(merge): ${(System.nanoTime() - r0) / 1e9}%.2f s")
    // segment append of the same delta (onto the refreshed index —
    // content doesn't matter for cost, the delta is what's tokenized
    // and written) + the serve through the tombstone filter
    val a0 = System.nanoTime()
    graft.operators.TextAnalysis.bm25AppendSegment(spark, idx, newD, oldD)
    println(f"BM25 append(segment): ${(System.nanoTime() - a0) / 1e9}%.2f s")
    (1 to 2).foreach { i =>
      val s0 = System.nanoTime()
      val n = graft.operators.TextAnalysis
        .bm25QueryIndex(spark, idx, terms, 20).count()
      println(f"BM25 serve+segment run$i: ${(System.nanoTime() - s0) / 1e9}%.2f s rows=$n")
    }
    val c0 = System.nanoTime()
    graft.operators.TextAnalysis.bm25Compact(spark, idx)
    println(f"BM25 compact: ${(System.nanoTime() - c0) / 1e9}%.2f s")
    spark.stop()
  }
}
