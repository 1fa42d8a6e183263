package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Splits the at-rest IVF lifecycle into BUILD (train + list write),
  * APPEND (fixed-centroid vector upsert), and SERVE (partition-pruned
  * query) at a given SF dir — the ivf analogue of [[Bm25Probe]].
  *
  * The optional `deltaCap` bounds the appended slice to
  * vec_id < cap (r12 verdict #3): the default appended slice
  * (vec_id ≡ 3 mod 10) is 10% of vectors and grows WITH the corpus,
  * so its slope conflates delta growth with corpus growth; passing
  * the 1× corpus's vec_id domain size on a ScaleUp-derived N× dir
  * (replica 0 occupies exactly that id range) appends a FIXED-size
  * delta to a growing index — the measurement that proves the
  * O(delta) claim of the FAISS add model.
  *
  * Usage: runMain graft.tools.IvfProbe <sfDir> [deltaCap]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cap = if (args.length > 1) args(1).toLong else Long.MaxValue
    val spark = Sessions.local("graft-ivf-probe")
    val idx = s"/tmp/graft_ivf_probe_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val all = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(pmod(col("vec_id"), lit(10)) =!= 3)
    val delta = all.filter(pmod(col("vec_id"), lit(10)) === 3)
      .filter(col("vec_id") < cap).localCheckpoint()
    println(s"IVF delta: ${delta.count()} of ${all.count()} vectors (cap=$cap)")
    val t0 = System.nanoTime()
    graft.operators.Similarity.ivfWriteIndexVecs(spark, base, idx)
    println(f"IVF build(base): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val a0 = System.nanoTime()
    graft.operators.Similarity.ivfAppendVectors(spark, idx, delta)
    println(f"IVF append: ${(System.nanoTime() - a0) / 1e9}%.2f s")
    (1 to 3).foreach { i =>
      val s0 = System.nanoTime()
      val n = graft.operators.Similarity.ivfQueryIndex(spark, dir, idx).count()
      println(f"IVF serve run$i: ${(System.nanoTime() - s0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
