package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Measures the two-level (tb, tk) postings layout's refresh PRUNING
  * in wall-clock — the evidence the shared fixture corpus cannot
  * give (its 31-term vocabulary makes every natural delta touch
  * every bucket, so registry-row refresh timings only show the
  * removed re-materializations).
  *
  * Controlled experiment on a WIDE-vocabulary corpus derived from the
  * real documents table (each token suffixed with a per-doc class
  * LETTER, doc_id mod 26 — the index tokenizer is alpha-runs, so the
  * suffix must be alphabetic to survive — vocab ≈ 31·26 terms spread
  * over the 26·nTk buckets):
  *   - narrow delta: N new docs whose vocabulary is 30 fresh terms
  *     sharing one first letter → the merge touches ≤ nTk buckets
  *   - wide delta: N new docs reusing corpus texts (all 26 suffix
  *     classes) → the merge touches ~every bucket
  * Same row count, same token volume, both purely additive — the
  * timing gap between the two refreshes IS the directory pruning.
  * Run on a ScaleUp dir to watch the narrow refresh stay flat while
  * the wide one tracks the corpus. Diagnostic only, never a gate.
  *
  * Usage: runMain graft.tools.Bm25VocabProbe <sfDir> [deltaN]
  */
object Bm25VocabProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val deltaN = if (args.length > 1) args(1).toInt else 200
    val spark = Sessions.local("graft-bm25-vocab-probe")
    val idx = s"/tmp/graft_bm25vp_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"VOCAB $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val cls = expr("char(97 + pmod(doc_id, 26))")
    val wide = docs.select(col("doc_id"),
      array_join(transform(split(col("text"), " "),
        t => concat(t, lit("w"), cls)), " ").as("text"))
    val none = docs.limit(0)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // vocab as the INDEX sees it (alpha-run tokens, lowercased)
    val vocab = timed("distinct index terms")(
      wide.select(explode(
        graft.functions.TextFns.alphaTokens(lower(col("text")))))
        .distinct().count())
    timed(s"build (vocab=$vocab)")(
      graft.operators.TextAnalysis.bm25WriteIndexDocs(spark, wide, idx))
    // narrow: fresh single-letter vocabulary → ≤ nTk touched buckets
    val zTerms = ('a' to 'z').map(c => s"zzq$c") ++
      ('a' to 'd').map(c => s"zzr$c")
    val zText = zTerms.mkString(" ")
    val narrow = spark.range(deltaN)
      .select((lit(maxId + 1L) + col("id")).as("doc_id"),
        lit(zText).as("text"))
    println("VOCAB narrow touched buckets: " +
      zTerms.map(graft.operators.TextAnalysis.tkOf).distinct.size +
      " (tb=z only)")
    timed(s"refresh narrow (+$deltaN docs, ${zTerms.size}-term z-vocab)")(
      graft.operators.TextAnalysis.bm25RefreshIndex(spark, idx,
        narrow, none))
    // wide: same size, vocabulary spanning every suffix class
    val wideDelta = wide.orderBy(col("doc_id")).limit(deltaN)
      .select((col("doc_id") + maxId + 1000000L).as("doc_id"), col("text"))
    timed(s"refresh wide (+$deltaN docs, corpus-spanning vocab)")(
      graft.operators.TextAnalysis.bm25RefreshIndex(spark, idx,
        wideDelta, none))
    (1 to 2).foreach { i =>
      val s0 = System.nanoTime()
      val n = graft.operators.TextAnalysis
        .bm25QueryIndex(spark, idx, Seq("datawa", "modelwb", "zzqa"), 20)
        .count()
      println(f"VOCAB serve run$i: ${(System.nanoTime() - s0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
