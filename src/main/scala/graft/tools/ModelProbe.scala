package graft.tools

import graft.Sessions

/** Threshold probe for the r11 Models operators: runs emb_pca and
  * domain_classifier at each given SF dir and prints the contract
  * rows plus the stderr margin lines, so pinned thresholds (the
  * classifier's accuracy/loss floors) are chosen from MEASURED
  * margins rather than guessed.
  *
  * Usage: runMain graft.tools.ModelProbe <sfDir> [<sfDir> ...]
  */
object ModelProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-model-probe")
    args.foreach { dir =>
      println(s"=== $dir ===")
      val t0 = System.nanoTime()
      graft.operators.Models.embPca(spark, dir).show(20, false)
      val t1 = System.nanoTime()
      graft.operators.Models.domainClassifier(spark, dir).show(20, false)
      val t2 = System.nanoTime()
      println(f"emb_pca ${(t1 - t0) / 1e9}%.2f s  domain_classifier ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
