package graft

import org.apache.spark.sql.functions._

/** The derived-corpus generator must preserve what the scale sweep
  * assumes: exact N× row counts, key-disjoint replicas, and FK
  * integrity within every replica — a generator bug here would make
  * every slope in PLANS.md's sweep a measurement of nothing.
  */
class ScaleUpSpec extends SparkSpec {

  private val out = "/tmp/graft_scaleup_spec"
  private val n = 3

  test("3x derived corpus: counts, key disjointness, FK integrity") {
    graft.tools.ScaleUp.run(spark, sf, out, n)

    // exact N× rows on replicated tables, 1× on dims
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$sf/$t.parquet").count()
      val big = spark.read.parquet(s"$out/$t.parquet").count()
      assert(big == n * base, s"$t: want ${n * base} rows, got $big")
    }
    for (t <- Seq("region", "nation"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ==
        spark.read.parquet(s"$sf/$t.parquet").count())

    // keys stay unique (replica offsets are disjoint)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val ords = spark.read.parquet(s"$out/orders.parquet")
    assert(ords.select("o_orderkey").distinct().count() == ords.count())

    // FK integrity: no orphans after offsetting
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val orphanOrders = ords.join(cust,
      ords("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(orphanOrders == 0, s"$orphanOrders orders reference missing customers")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val orphanLines = li.join(ords,
      li("l_orderkey") === ords("o_orderkey"), "left_anti").count()
    assert(orphanLines == 0, s"$orphanLines lineitems reference missing orders")

    // events survive the ns-timestamp round trip as a readable table
    assert(Tables.events(spark, out).select(col("ts")).schema("ts")
      .dataType.typeName == "timestamp")
  }
}
