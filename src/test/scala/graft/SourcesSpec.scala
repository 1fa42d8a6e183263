package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Source/sink format coverage beyond text/csv/json/parquet, plus the
  * partition-pruning pattern that matters most at 100 TB: data laid
  * out by a partition column so filters skip whole directories.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("orc sink/source round-trips values and schema") {
    val out = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    val orig = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber").limit(100)
    orig.write.orc(s"$out/li")
    val back = spark.read.orc(s"$out/li")
    assert(back.schema == orig.schema)
    assert(back.as[(Long, Int, Double, String)].collect().toSet ==
      orig.as[(Long, Int, Double, String)].collect().toSet)
  }

  test("partitioned parquet write → scan prunes partitions on filter") {
    val out = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(s"$out/orders")

    // physical layout: one directory per year
    val dirs = new java.io.File(s"$out/orders").listFiles()
      .filter(_.getName.startsWith("order_year=")).map(_.getName).sorted
    assert(dirs.length > 1, s"expected multiple year partitions, got ${dirs.toSeq}")

    val q = spark.read.parquet(s"$out/orders")
      .filter(col("order_year") === 1995)
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    // the year filter must appear as a PartitionFilter (pruning whole
    // directories), not a post-scan data filter
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan)

    val expected = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(q.as[Long].collect().head == expected)
  }
}
