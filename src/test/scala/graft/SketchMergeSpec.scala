package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Mergeable-sketch invariants: HLL union at equal lgK is lossless
  * (merging per-group sketches gives the SAME estimate as one global
  * sketch), and estimates stay within HLL's error bound of exact.
  */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  test("union of per-group sketches tracks one global sketch") {
    // independent of hllMerge's own merge_within_5pct column: rebuild
    // both sides with raw expressions and compare. Equality is EXACT
    // in sparse (coupon) mode — which the sf0.001 fixture is in — and
    // within the error bound once dense (measured 0.27% at sf0.01,
    // 0.65% at sf0.1); assert the bound that holds at every SF so the
    // spec stays green if the fixture SF ever changes.
    val merged = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
        .cast("bigint").as("e"))
      .as[Long].head()
    val global = Tables.orders(spark, sf)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))")
        .cast("bigint").as("e"))
      .as[Long].head()
    assert(math.abs(merged - global) <= 0.05 * global,
      s"merged=$merged global=$global")
  }

  test("hllMerge contract booleans hold and exact counts are exact") {
    // unconditional raw-margin dump (r11 ADVICE): the contract rows
    // hash only booleans, so when a probabilistic gate DOES go red —
    // here or at the driver — the estimates behind it must already be
    // on stderr to tell sketch noise from a regression
    Verify.sketchContractDiag(spark, sf)
      .foreach(l => System.err.println(s"[sketch-diag] $l"))
    val rows = Relational.hllMerge(spark, sf)
      .select(col("grp"), col("exact_custs"), col("est_within_5pct"),
        col("merge_within_5pct"))
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.exists(_._1 == "ALL"))
    rows.foreach { case (g, exact, within, agrees) =>
      assert(within, s"group $g: estimate outside 5% of exact=$exact")
      assert(agrees, s"group $g: merge_within_5pct false")
    }
    val exactAll = Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey")).cast("long").as("c")).as[Long].head()
    assert(rows.find(_._1 == "ALL").get._2 == exactAll)
  }

  test("KLL merged median has true rank within 0.5±0.05") {
    // independent re-derivation: build per-group + merged estimates
    // with raw expressions, then measure true ranks driver-side
    val per = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice, 200)").as("sk"))
    val ests = per.select(col("l_returnflag").as("grp"),
        expr("kll_sketch_get_quantile_double(sk, 0.5d)").as("est"))
      .as[(String, Double)].collect() :+
      ("ALL" -> per.agg(
        expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5d)")
          .as("e")).as[Double].head())
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    ests.foreach { case (g, est) =>
      val vals = if (g == "ALL") li.map(_._2) else li.filter(_._1 == g).map(_._2)
      val rank = vals.count(_ <= est).toDouble / vals.length
      assert(math.abs(rank - 0.5) < 0.05, s"group $g: est=$est rank=$rank")
    }
    // and the query's own contract rows agree
    val rows = Relational.kllMerge(spark, sf)
      .select(col("grp"), col("n"), col("median_rank_within_5pct"))
      .as[(String, Long, Boolean)].collect()
    assert(rows.exists(_._1 == "ALL"))
    rows.foreach { case (g, n, ok) =>
      assert(ok, s"group $g (n=$n): median rank outside 0.5±0.05")
    }
  }

  test("CMS point estimates never underestimate — any key, not just the top-k") {
    // rebuild the same md5-bucket sketch driver-side on the fixture
    // and check min-over-rows >= exact for EVERY key (the query's
    // never_under column only witnesses the top 10)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(j: Int, k: Long): Int = {
      val hex = md.digest(s"$j:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    val keys = Tables.lineitem(spark, sf).select(col("l_suppkey"))
      .as[Long].collect()
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val sketch = Array.ofDim[Long](4, 256)
    for (k <- keys; j <- 0 until 4) sketch(j)(bucket(j, k)) += 1
    exact.foreach { case (k, cnt) =>
      val est = (0 until 4).map(j => sketch(j)(bucket(j, k))).min
      assert(est >= cnt, s"key $k: est=$est < exact=$cnt")
    }
    // and the query's contract columns hold
    val rows = Relational.cmsTopK(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4), s"contract violated: $r")
      val est = (0 until 4).map(j => sketch(j)(bucket(j, r.getLong(0)))).min
      assert(est == r.getLong(2), s"query est != reference est for key ${r.getLong(0)}")
    }
  }
}
