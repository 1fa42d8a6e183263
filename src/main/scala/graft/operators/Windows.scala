package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions and grouping sets — absent from the reference
  * (SURVEY.md §2b), engine-provided. One shuffle per distinct
  * partitioning; the three order-window queries share
  * partitionBy(o_custkey) so their exchange is identical in shape.
  */
object Windows {

  private def custDateWindow =
    Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  /** row_number + rank per customer by order date; latest 3 orders.
    * Tie-break on o_orderkey keeps row_number deterministic.
    */
  def rankPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk")
      )
      .filter(col("rn") <= 3L)
      .orderBy("o_custkey", "rn")
  }

  /** Running total per customer (rowsBetween unbounded→current). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice"))
          .over(custDateWindow.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running_total")
      )
      .orderBy("o_custkey", "o_orderkey")

  /** lag: delta vs the customer's previous order. */
  def lagDelta(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") -
          coalesce(lag(col("o_totalprice"), 1).over(custDateWindow), lit(0.0)), 2)
          .as("delta_prev")
      )
      .orderBy("o_custkey", "o_orderkey")

  /** Typed per-group imperative logic (KeyValueGroupedDataset
    * .mapGroups — the batch face of the reference's user-supplied
    * ReduceFunc shape): per customer, the maximum day-gap between
    * consecutive orders. The oracle states the same fact with window
    * functions — the typed and declarative forms must agree.
    */
  def typedOrderGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ; cast via session-UTC for epoch
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (cust, it) =>
        val times = it.toArray.sortBy(r => (r._3, r._2)).map(_._3)
        val maxGapDays =
          if (times.length < 2) 0L
          else times.sliding(2).map(w => (w(1) - w(0)) / 86400000000L).max
        (cust, times.length.toLong, maxGapDays)
      }
      .toDF("o_custkey", "n_orders", "max_gap_days")
      .orderBy("o_custkey")
  }

  /** RANGE-frame window: events per user in the trailing hour
    * (numeric range frame over epoch micros — peers included, unlike
    * a ROWS frame).
    */
  def trailingHourCount(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour")
      )
      .orderBy("user_id", "event_id")
  }

  /** ntile / first_value / last_value with an explicit full frame. */
  def quartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = custDateWindow
    val full = custDateWindow
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        first(col("o_orderkey")).over(full).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution window functions: percent_rank / cume_dist over a
    * unique ordering. Emitted unrounded — both engines divide the
    * same small integers, so the doubles are bit-identical.
    */
  def distributionRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = custDateWindow
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP on (returnflag, linestatus). NULL group markers are
    * coalesced to 'ALL' so ordering semantics match the DuckDB oracle
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST — sidestep entirely).
    */
  def rollupQty(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n")
      )
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n")
      )
      .orderBy("rflag", "lstatus")

  /** CUBE on (orderstatus, orderpriority). */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total")
      )
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total")
      )
      .orderBy("status", "priority")
}
