package graft.tools

import graft.Sessions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Stage decomposition of `sim_neardup` (r16 verdict missing #4: the
  * 100×-perturbed reading is the family's steepest — this probe
  * attributes it). The row's pipeline is
  *
  *   exactGroups  (collapse bit-identical vectors; one exchange)
  *   → cellAssignments (√n-cell Lloyd on a ≤1024-vector sample +
  *     two-level routed assignment: ~n·n^0.25 integer dots)
  *   → cellVerified   (Σ|cell|² within-cell exact verify join)
  *   → forest edges   (per-group min neighbor + member rule)
  *
  * and each stage is timed through a count() of its own output, so
  * the deltas between consecutive rows attribute wall-clock to the
  * stage that produced them (each stage re-runs its upstream — read
  * the INCREMENTS, not the absolutes).
  *
  * `minSim` is the knob that actually governs the verify stream at
  * scale: the candidate set converges to the TRUE pair set (measured
  * 95% at 100×p), and true pairs ≥ threshold are a property of the
  * corpus, not the blocking.
  *
  * Usage: runMain graft.tools.SimNdProbe <sfDir> [nCells] [minSim]
  */
object SimNdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 0
    val minSim = if (args.length > 2) args(2).toDouble else 0.3
    val spark = Sessions.local("graft-simnd-probe")
    def time(label: String)(thunk: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = thunk
        println(f"PROBE $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    time("groups") {
      Similarity.exactGroups(spark, dir)._1.count()
    }
    time("route") {
      val (groups, _) = Similarity.exactGroups(spark, dir)
      Similarity.cellAssignments(spark, groups, nCells, 4).count()
    }
    time("verify") {
      val (groups, _) = Similarity.exactGroups(spark, dir)
      Similarity.cellVerified(spark, groups, minSim, nCells, 4).count()
    }
    time("full") {
      Similarity.embeddingNearDup(spark, dir, minSim = minSim,
        nCells = nCells).count()
    }
    spark.stop()
  }
}
