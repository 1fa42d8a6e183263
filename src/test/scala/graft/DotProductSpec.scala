package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == higher-order-function fold, bitwise, on the corpus") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      GraftFunctions.dot(col("embedding"), col("embedding")).as("native"),
      aggregate(
        zip_with(
          transform(col("embedding"), x => x.cast("double")),
          transform(col("embedding"), x => x.cast("double")),
          (x, y) => x * y),
        lit(0.0), (s, v) => s + v).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n == h) } // exact, not approx
  }

  test("works via SQL and on double arrays; min-length semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D)) ")
      .as[Double].collect().head
    assert(r == 1.0 * 4.0 + 2.0 * 5.0)
  }

  test("null array yields null; mixed float/double works") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect().head
    assert(r.isNullAt(0))
    val m = spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT)), array(3.0D))")
      .as[Double].collect().head
    assert(m == 6.0)
  }

  test("stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = Tables.embeddings(spark, sf)
      .select(GraftFunctions.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
  }
}
