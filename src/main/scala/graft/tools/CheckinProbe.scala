package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Splits the at-rest near-dup index lifecycle into BUILD (one-time
  * corpus signature pass) and CHECK-IN (delta vs indexed corpus) at a
  * given SF dir — the dedup analogue of [[Bm25Probe]]/[[IvfProbe]].
  *
  * The optional `deltaCap` bounds the delta to doc_id < cap: passing
  * the 1× corpus's doc_id domain size on a ScaleUp-derived N× dir
  * applies a FIXED-size delta to a growing index — the measurement
  * that separates the check-in's O(delta + collisions) shuffle from
  * its O(index-scan) I/O floor (the two slim map-side scans).
  *
  * Usage: runMain graft.tools.CheckinProbe <sfDir> [deltaCap]
  */
object CheckinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cap = if (args.length > 1) args(1).toLong else Long.MaxValue
    val spark = Sessions.local("graft-checkin-probe")
    val idx = s"/tmp/graft_checkin_probe_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
      .filter(col("doc_id") < cap).localCheckpoint()
    println(s"CHECKIN delta: ${delta.count()} of ${docs.count()} docs (cap=$cap)")
    val t0 = System.nanoTime()
    graft.operators.Dedup.neardupWriteIndex(spark, idx = idx,
      docs = docs.filter(pmod(col("doc_id"), lit(4)) =!= 1))
    println(f"CHECKIN build(base): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to 2).foreach { i =>
      val c0 = System.nanoTime()
      val n = graft.operators.Dedup.neardupCheckIn(spark, idx, delta).count()
      println(f"CHECKIN checkin run$i: ${(System.nanoTime() - c0) / 1e9}%.2f s pairs=$n")
    }
    spark.stop()
  }
}
