package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Stage-level timing of the near-dup check-in at a given SF dir:
  * separates the dry-run lookup (signature pass + candidate gen +
  * verify) from the admit appends, so layout-overhead regressions
  * (r14: 64-dir partitioned writes) are attributable. Diagnostic
  * only — never part of any gate.
  */
object CheckinBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cap = if (args.length > 1) args(1).toLong else Long.MaxValue
    val spark = Sessions.local("graft-checkin-breakdown")
    val idx = s"/tmp/graft_ckbk_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
      .filter(col("doc_id") < cap).localCheckpoint()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BKDN $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("build(base)") {
      graft.operators.Dedup.neardupWriteIndex(spark, idx = idx,
        docs = docs.filter(pmod(col("doc_id"), lit(4)) =!= 1))
    }
    (1 to 2).foreach { i =>
      timed(s"copyIndex run$i") {
        import org.apache.hadoop.fs.{FileUtil, Path}
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new Path(idx).getFileSystem(conf)
        fs.delete(new Path(s"${idx}_copy"), true)
        FileUtil.copy(fs, new Path(idx), fs, new Path(s"${idx}_copy"),
          false, conf)
      }
    }
    (1 to 2).foreach { i =>
      timed(s"lookup-only run$i") {
        graft.operators.Dedup.neardupLookup(spark, idx, delta).count()
      }
    }
    // each run admits the delta into a PRISTINE copy — re-checking
    // the same delta into the run-1-mutated index would violate
    // neardupCheckIn's fresh-id precondition and time a different
    // (duplicate-laden) workload
    (1 to 2).foreach { i =>
      val tgt = s"${idx}_ck$i"
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(idx).getFileSystem(conf)
      fs.delete(new Path(tgt), true)
      FileUtil.copy(fs, new Path(idx), fs, new Path(tgt), false, conf)
      timed(s"full check-in run$i") {
        graft.operators.Dedup.neardupCheckIn(spark, tgt, delta).count()
      }
    }
    spark.stop()
  }
}
