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
}
