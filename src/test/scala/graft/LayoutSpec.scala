package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Storage-layout invariants: partitioned writes must prune at the
  * directory level, bucketed tables must join and aggregate with no
  * Exchange anywhere in the plan, and neither layout may change
  * results.
  */
class LayoutSpec extends SparkSpec {

  private val partDir = "/tmp/graft_test_docs_by_lang"

  test("partitionBy write + lang filter prunes partitions, same rows") {
    Layout.writePartitionedDocs(spark, sf, partDir)
    val sliced = Layout.langSlice(spark, partDir, "en")
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("(lang"), s"no partition pruning:\n$plan")
    // the lang predicate must NOT appear as a pushed data filter —
    // it's resolved against directories before any file is opened
    assert(!plan.contains("PushedFilters: [IsNotNull(lang"), plan)
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(sliced.count() == expected)
  }

  test("at-rest IVF index: serving scan prunes to the probed cells only") {
    import graft.operators.Similarity
    val idx = "/tmp/graft_test_ivf_idx"
    Similarity.ivfWriteIndex(spark, sf, idx)
    val served = Similarity.ivfQueryIndex(spark, sf, idx)
    val plan = served.queryExecution.executedPlan.toString
    // the cell IN-filter must resolve against directories, pruning
    // unprobed cells before any file is opened
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"no cell pruning:\n$plan")
    // and serving must agree with the one-shot build+serve query
    val oneShot = Similarity.ivfIndexTopK(spark, sf)
    assert(served.collect().toSeq == oneShot.collect().toSeq)
    // with only 2 of 8 cells probed per query, at least one cell dir
    // must be absent from the scanned partitions
    val scannedCells = served
      .queryExecution.executedPlan.collectLeaves().toString
    val nCellDirs = new java.io.File(s"$idx/lists").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(nCellDirs >= 2, s"index should have multiple cell dirs")
  }

  test("bucketed tables join + aggregate with zero Exchange") {
    Layout.writeBucketedOrderTables(spark, sf)
    val df = Layout.bucketedOrderTotals(spark)
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan shuffles:\n$plan")
    // results identical to the raw-parquet join
    val expected = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("sum_qty"))
      .orderBy("o_orderkey").collect()
    val got = df.orderBy("o_orderkey").collect()
    assert(got.sameElements(expected))
  }
}
