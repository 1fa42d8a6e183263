package graft.tools

import graft.Sessions

/** Companion to [[ScaleUp]]: time parameterized operator variants on a
  * derived corpus — the knobs (shingle df cap, IVF cell count) that a
  * real deployment scales with the data, which the fixed-default
  * registry entries can't show. Results land in PLANS.md's sweep.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <maxDf> <nCells>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val maxDf = args(1).toInt; val nCells = args(2).toInt
    val spark = Sessions.local("graft-scaleprobe")
    def time(label: String)(thunk: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = thunk
        println(f"PROBE $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    time(s"dedup_clusters[maxDf=$maxDf]") {
      graft.operators.Dedup.dedupClusters(spark, dir, maxDf = maxDf).count()
    }
    time(s"dedup_clusters_star[maxDf=$maxDf]") {
      graft.operators.Dedup.dedupClustersStar(spark, dir, maxDf = maxDf).count()
    }
    time(s"sim_neardup[nCells=$nCells]") {
      graft.operators.Similarity.embeddingNearDup(spark, dir, nCells = nCells).count()
    }
    spark.stop()
  }
}
