package graft.tools

import graft.Sessions

/** Splits bm25_index_topk's cost into BUILD (index write) vs SERVE
  * (partition-pruned query) at a given SF dir — the number that
  * matters at scale is the serve, since the build runs once at
  * ingest. Usage: runMain graft.tools.Bm25Probe <sfDir>
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
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
    spark.stop()
  }
}
