package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Dump the INNER near-dup lookup plans — the candidate plan (which
  * holds the `buckets` index scan) and the pairs plan (which holds the
  * `docsets` index scan) — with their runtime PartitionFilters. The
  * registry rows checkpoint the lookup, so `Plans` only ever shows a
  * Scan ExistingRDD; this is the plan-evidence view of what the
  * checkpoint hides (never part of any gate).
  *
  * Usage: runMain graft.tools.LookupPlans <sfDir>
  */
object LookupPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-lookup-plans")
    val idx = s"/tmp/graft_lookup_plans_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    graft.operators.Dedup.neardupWriteIndex(spark, idx = idx,
      docs = docs.filter(pmod(col("doc_id"), lit(4)) =!= 1))
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
      .localCheckpoint()
    val (pairs, _, cand) = graft.operators.Dedup.lookupPlan(
      spark, idx, delta, minJ = 0.2, n = 3, k = 16, bands = 4,
      capBucket = Int.MaxValue)
    println("\n===== candidate plan (buckets index scan) =====")
    cand.count() // let AQE finalize + DPP resolve
    println(cand.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("\n===== pairs plan (docsets index scan) =====")
    pairs.count()
    println(pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
