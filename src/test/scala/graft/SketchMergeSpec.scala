package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Mergeable-sketch invariants: HLL union at equal lgK is lossless
  * (merging per-group sketches gives the SAME estimate as one global
  * sketch), and estimates stay within HLL's error bound of exact.
  */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  test("union of per-group sketches == one global sketch, exactly") {
    val merged = Relational.hllMerge(spark, sf)
      .filter(col("grp") === "ALL")
      .select(col("est_custs")).as[Long].head()
    val global = Tables.orders(spark, sf)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))")
        .cast("bigint").as("e"))
      .as[Long].head()
    assert(merged == global, s"merged=$merged global=$global")
  }

  test("KLL merged median has true rank within 0.5±0.05") {
    val rows = Relational.kllMerge(spark, sf)
      .select(col("grp"), col("est_median"))
      .as[(String, Double)].collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    rows.foreach { case (g, est) =>
      val vals = if (g == "ALL") li.map(_._2) else li.filter(_._1 == g).map(_._2)
      val rank = vals.count(_ <= est).toDouble / vals.length
      assert(math.abs(rank - 0.5) < 0.05, s"group $g: est=$est rank=$rank")
    }
  }

  test("estimates within 5% of exact for every group") {
    val rows = Relational.hllMerge(spark, sf)
      .select(col("grp"), col("est_custs"), col("exact_custs"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (g, est, exact) =>
      val err = math.abs(est - exact).toDouble / math.max(exact, 1L)
      assert(err < 0.05, s"group $g: est=$est exact=$exact err=$err")
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
