package graft

import graft.functions.BloomMightContain
import graft.operators.Joins
import org.apache.spark.sql.functions._

/** The bloom-prefiltered join must (a) equal the plain join exactly
  * (false positives removed by the exact join), (b) place the bloom
  * probe below the join so the fact side is pruned before any
  * shuffle, and (c) never produce false negatives on the probe.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe has no false negatives and few false positives") {
    val keys = spark.range(0, 1000).toDF("k")
    val bloom = keys.stat.bloomFilter("k", 1000, 0.01)
    val probed = spark.range(0, 10000).toDF("k")
      .filter(BloomMightContain.probe(col("k"), bloom))
      .as[Long].collect().toSet
    assert((0L until 1000L).forall(probed.contains), "false negative")
    // fpp 1% over 9000 negatives → expect ~90; allow generous slack
    assert(probed.size < 1000 + 500, s"too many false positives: ${probed.size}")
  }

  test("null keys probe to null (filter drops them)") {
    val bloom = spark.range(0, 10).toDF("k").stat.bloomFilter("k", 10, 0.01)
    val n = Seq[Option[Long]](Some(1L), None, Some(99L)).toDF("k")
      .filter(BloomMightContain.probe(col("k"), bloom))
      .count()
    assert(n == 1L)
  }

  test("prefiltered join equals the plain join") {
    val withBloom = Joins.bloomPrefilteredJoin(spark, sf).collect()
    val plain = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf)
          .filter(col("c_acctbal") > 8000.0)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(14,2)")), 2)
          .cast("double").as("total_price"))
      .orderBy("c_mktsegment").collect()
    assert(withBloom.sameElements(plain))
  }

  test("plan probes the bloom filter on the fact side below the join") {
    val plan = Joins.bloomPrefilteredJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"), plan)
    // the probe must sit in a Filter over the orders scan, i.e. the
    // string order is Join ... Filter(graft_bloom...) ... FileScan orders
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("graft_bloom_might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe not below the join:\n$plan")
  }
}
