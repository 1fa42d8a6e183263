package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join surface. The reference has no joins at all (SURVEY.md §2b) —
  * this is engine-provided capability: equi inner/left/semi/anti,
  * broadcast, and a non-equi range join.
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation/supplier/part) are broadcast —
  *    no shuffle of the fact side on those joins;
  *  - fact⋈fact joins (orders⋈lineitem) shuffle on the join key once
  *    and reuse that partitioning for the downstream aggregation
  *    where keys align;
  *  - AQE (enabled in the session) converts to broadcast at runtime
  *    when a filtered side turns out small, and splits skewed
  *    partitions.
  */
object Joins {

  /** Inner equi-join chain customer⋈nation⋈region with both dims
    * broadcast; revenue rolled up per region.
    */
  def innerPerNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders")
      )
      .orderBy("n_name")
  }

  /** 3-way fact join (TPC-H Q3 shape): customer⋈orders⋈lineitem,
    * revenue per order, top 10. Filters push below the joins.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      // decimal so the 4-decimal product sum is exact (see
      // Relational.pricingSummary note on .xx50 round boundaries)
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Left outer join: every customer, order count + total (0 for
    * customers with no orders).
    */
  def leftOuterOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total")
      )
      .orderBy("c_custkey")
  }

  /** Left semi join = EXISTS: customers having at least one
    * high-value order.
    */
  def semiHighValue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 250000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Left anti join = NOT EXISTS: customers with no orders at all. */
  def antiNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy("c_custkey")
  }

  /** Explicit broadcast-hash join: supplier enriched through
    * nation⋈region (both broadcast), counting suppliers per region.
    */
  def broadcastDims(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal")
      )
      .orderBy("r_name")
  }

  private def discountedRevenue =
    sum(col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)")))

  /** TPC-H Q5 shape: 6-table join (region⋈nation⋈customer⋈orders⋈
    * lineitem⋈supplier with the local-supplier constraint), revenue
    * per nation. Dims broadcast; the fact chain shuffles once per
    * fact-fact key.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(discountedRevenue, 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q14 shape: promo revenue share — conditional aggregation
    * over a fact⋈dim join. The ratio divides two decimal-exact sums,
    * cast to double only at the end.
    */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val disc = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0)
          .cast("decimal(14,2)"))).cast("double") * 100.0 /
          sum(disc).cast("double"), 4).as("promo_pct"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q19 shape: disjunctive multi-attribute predicates
    * (brand × size-range × quantity-range OR-branches) over the
    * fact⋈dim join — the predicate-complexity stress case; Catalyst
    * pushes the common l_quantity bounds below the join.
    */
  def brandQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(5, 20) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#5" && col("p_size").between(10, 40) &&
          col("l_quantity").between(20, 50)))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q10 shape: customers who returned items, ranked by lost
    * revenue, top 20.
    */
  def returnedItemCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(discountedRevenue, 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Interval join, bucketed: click→purchase conversions by the same
    * user within 5 minutes. A naive theta join is per-user quadratic;
    * here each side is bucketed to 5-minute epochs and the right side
    * probes only buckets {b, b+1} (any pair within the interval spans
    * at most adjacent buckets), turning the non-equi condition into an
    * equi-join on (user_id, bucket) + a residual filter — the standard
    * scalable interval-join shape. The oracle states the plain theta
    * join; results must be identical.
    */
  def intervalClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val bucketUs = 300000000L // 5 min in micros
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val b = expr(s"us div $bucketUs") // integer division — no FP drift
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("us").as("cus"), explode(array(b, b + 1)).as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("pus"), b.as("bucket"))
    // a qualifying pair lands in exactly one bucket value, so the
    // equi-join introduces no duplicates
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("pus") > col("cus") &&
        col("pus") - col("cus") <= bucketUs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("pus") - col("cus")).as("delta_us"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** TPC-H Q6 shape (forecast revenue change): a single scan with
    * three conjunctive predicates and one aggregate — the canonical
    * full-pushdown query. All three filters reach the parquet scan;
    * the revenue product uses decimal arithmetic so the sum is exact
    * and rounds identically in DuckDB (see pricingSummary).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(14,2)") *
          col("l_discount").cast("decimal(14,2)")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    * keep the max. The max is a broadcast scalar (one row) joined
    * back as an equality filter — NOT a global window, which would
    * serialize the aggregate through one task. The equality compares
    * DECIMALS (exact on both engines); rounding to double happens
    * only in the output projection.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(14,2)") *
        (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)")))
        .as("total_rev"))
    val best = rev.agg(max(col("total_rev")).as("best_rev"))
    rev.join(broadcast(best), col("total_rev") === col("best_rev"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_rev"), 2).cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total
    * quantity exceeds a threshold, with their customer. The HAVING
    * aggregate runs on lineitem alone (partial-agg friendly, tiny
    * survivor set), then joins orders + customer — the survivors
    * drive the probe side, so at 100 TB the expensive join only sees
    * the filtered keys.
    */
  def largeVolumeOrders(spark: SparkSession, dir: String,
                        minQty: Double = 350.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** TPC-H Q4 shape (order-priority check): orders in a quarter that
    * have at least one late-shipped line (shipdate > orderdate + 60d;
    * the fixture carries no commit/receipt dates, so lateness is
    * defined against the order date — same EXISTS plan shape).
    * LEFT SEMI join: the probe stops at the first matching line, no
    * row multiplication, and the quarter filter pushes into the
    * orders scan before the join.
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q7 shape (volume shipping between two nations): revenue
    * flowing supplier-nation → customer-nation per shipment year, for
    * one nation pair in both directions. The two nation dims
    * broadcast onto supplier and customer; lineitem⋈orders is the
    * only fact shuffle; the pair filter collapses the keyspace before
    * the aggregate.
    */
  def nationVolume(spark: SparkSession, dir: String,
                   na: String = "NATION_1", nb: String = "NATION_2"): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)"))), 2)
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q12 shape (late shipment priority mix): lines shipped >30
    * days after their order date in 1996, split per line status into
    * high-/low-priority counts. One fact⋈fact join; the year filter
    * pushes into the lineitem scan; the CASE sums are a partial agg.
    */
  def latePriorityMix(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q13 shape (customer order distribution): orders-per-
    * customer histogram INCLUDING zero-order customers — the left
    * outer join with a predicate on the RIGHT side's rows (priority
    * filter lives in the join condition, so unmatched customers
    * survive). Two partial-agg passes, both on already-shuffled keys.
    */
  def orderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= "5-LOW", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17 shape (small-quantity revenue): lines of one brand's
    * small parts with quantity below 20% of that part's average.
    * The correlated `avg` is decorrelated into one per-part aggregate
    * joined back; the threshold compare is the EXACT integer rewrite
    * `5·q·cnt < sum(q)` (quantities are integral doubles ≤ 2^53), so
    * no cross-engine float boundary can flip a row's membership.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("sum_q"), count(lit(1)).as("cnt"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#13" && col("p_size") < 5)
      .select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") * lit(5.0) * col("cnt") < col("sum_q"))
      .agg((sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double") / 7.0)
        .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22 shape (idle wealthy customers): customers with an
    * above-average positive balance and no URGENT orders, per market
    * segment (every fixture customer has some order, so the anti
    * side filters to urgent ones to stay non-vacuous — same plan
    * shape as the original's no-orders test). The global threshold
    * is a 1-row broadcast; membership uses EXACT decimal·count
    * arithmetic (never a double average, so the boundary can't flip
    * cross-engine); the no-urgent-orders test is a LEFT ANTI join on
    * the filtered order keys only.
    */
  def idleBalanceCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("bal", col("c_acctbal").cast("decimal(14,2)"))
    val thr = c.filter(col("bal") > 0)
      .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(thr))
      .filter(col("bal") * col("n") > col("s"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** Salted skew join — the pattern that keeps a fact⋈fact shuffle
    * join alive when one key holds a disproportionate share of rows
    * (the first thing that breaks at 100× scale: every row of the hot
    * key lands on one reducer).
    *
    * A deliberately skewed key is synthesized (every 4th order is
    * re-pointed at customer 1 → ~25% of the fact on one key), then:
    *   1. hot keys are identified with a cheap fact-side count
    *     aggregate (output is tiny by definition — at most
    *     |fact|/threshold keys — and broadcast, never collected);
    *   2. fact rows on hot keys get a deterministic salt in [0, S)
    *     (hash of the row's unique key — reproducible, no RNG);
    *   3. the other side replicates each HOT key's row S times (cold
    *     keys stay single) via explode, so join key (k, salt) matches
    *     exactly one replica per fact row;
    *   4. the join is forced to shuffle (`shuffle_hash` hint) — the
    *     broadcast escape hatch would hide the skew problem this
    *     operator exists to solve (a real hot dim may not fit in
    *     memory).
    * Result is provably identical to the unsalted join (each fact row
    * meets exactly one replica), so the DuckDB oracle is the plain
    * join. The hot key's rows now spread across S reducer partitions
    * instead of one. AQE's OptimizeSkewedJoin does this splitting
    * adaptively for sort-merge joins; the explicit salt is the
    * portable form that also covers aggregate keys and pre-AQE
    * engines.
    */
  def saltedSkewJoin(spark: SparkSession, dir: String, salts: Int = 8,
                     hotThreshold: Long = 100): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(
        when(col("o_orderkey") % 4 === 0, 1L)
          .otherwise(col("o_custkey")).as("hk"),
        col("o_orderkey"), col("o_totalprice"))
    val hot = orders.groupBy(col("hk"))
      .agg(count(lit(1)).as("c")).filter(col("c") > hotThreshold)
      .select(col("hk"), lit(true).as("is_hot"))
    val fact = orders.join(broadcast(hot), Seq("hk"), "left")
      .select(col("hk"), col("o_totalprice"),
        when(col("is_hot"),
          pmod(xxhash64(col("o_orderkey")), lit(salts.toLong)))
          .otherwise(lit(0L)).as("salt"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(broadcast(hot.withColumnRenamed("hk", "c_custkey")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(when(col("is_hot"),
          sequence(lit(0L), lit(salts.toLong - 1L)))
          .otherwise(array(lit(0L)))).as("salt"))
    fact.hint("shuffle_hash")
      .join(dim, fact("hk") === dim("c_custkey") &&
        fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Non-equi range join: bucket orders into price tiers via an
    * inline tier table joined on `lo <= price < hi`. The tier side is
    * tiny → Spark plans BroadcastNestedLoopJoin; at 100 TB the fact
    * side streams through without a shuffle.
    */
  def rangeJoinTiers(spark: SparkSession, dir: String): DataFrame = {
    val tiers = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("T1_low", 0.0, 100000.0),
        Row("T2_mid", 100000.0, 250000.0),
        Row("T3_high", 250000.0, 1e9)
      ),
      StructType(Seq(
        StructField("tier", StringType, nullable = false),
        StructField("lo", DoubleType, nullable = false),
        StructField("hi", DoubleType, nullable = false)
      ))
    )
    val o = Tables.orders(spark, dir)
    o.join(broadcast(tiers),
        o("o_totalprice") >= tiers("lo") && o("o_totalprice") < tiers("hi"))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 2).as("avg_price")
      )
      .orderBy("tier")
  }

  // ------------------------------------------------------------------
  // Remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q16/Q20/Q21) — the
  // fixture has no partsupp table, so the part↔supplier relation is
  // the distinct (l_partkey, l_suppkey) pairs of lineitem and
  // ps_supplycost's stand-in is the offered unit price
  // l_extendedprice/l_quantity (per-row IEEE division — bit-identical
  // in Spark and DuckDB, so min/equality on it is cross-engine safe).
  // ------------------------------------------------------------------

  /** TPC-H Q2 shape (min-cost supplier): for mid-size STANDARD parts,
    * the EUROPE supplier offering the lowest unit price. The
    * correlated MIN subquery is decorrelated into a per-part
    * aggregate joined back on equality; all dimension sides
    * (part/supplier/nation/region) broadcast, so the only shuffle is
    * the offers aggregation on (part,supplier). ORDER BY covers a
    * unique key set so the LIMIT cut is deterministic cross-engine.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_name"))
    val eurSup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir))
          .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"),
        col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_price"))
    val minPer = offers.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("unit_price")).as("min_price"))
    offers.join(minPer,
        col("p_partkey") === col("mk") && col("unit_price") === col("min_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        round(col("unit_price"), 6).as("unit_price"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8 shape (national market share): of EUROPE customers'
    * 1996–1997 order volume, the share supplied by NATION_3, per
    * order year. Numerator/denominator are exact decimal sums; the
    * ratio is a double division of identical operands on both
    * engines, so no rounding boundary can flip it.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val custEur = Tables.customer(spark, dir)
      .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir))
          .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(custEur), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast("decimal(14,2)"))).as("num"),
        sum(vol).as("den"))
      .select(col("o_year"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit): profit per supplier nation
    * per order year over parts named like '%widget%'; the supply-cost
    * term is p_retailprice-based (no partsupp in the fixture). All
    * arithmetic in decimal; rounded to cents then cast double only in
    * the output projection.
    */
  def profitByNation(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"),
        col("p_retailprice").cast("decimal(14,2)").as("p_cost"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount =
      col("l_extendedprice").cast("decimal(14,2)") *
        (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)")) -
        col("p_cost") * lit("0.1").cast("decimal(4,2)") *
          col("l_quantity").cast("decimal(14,2)")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important part values): per-part value supplied
    * by ASIA-nation suppliers, keeping parts above 0.1% of the global
    * total. The global threshold is a 1-row broadcast; membership is
    * the EXACT decimal rewrite `value*1000 > total` — never a double
    * fraction, so the boundary can't flip cross-engine.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val asiaSup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir))
          .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val vals = Tables.lineitem(spark, dir)
      .join(broadcast(asiaSup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(14,2)")).as("value"))
    val total = vals.agg(sum(col("value")).as("total"))
    vals.crossJoin(broadcast(total))
      .filter(col("value") * lit(1000) > col("total"))
      .select(col("l_partkey"),
        round(col("value"), 2).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape (supplier count by part attributes): distinct
    * suppliers per (brand, type, size) from lineitem's part–supplier
    * pairs, excluding one brand and "complaint" suppliers (negative
    * balance — the fixture has no comment text) via NOT IN → anti
    * join. The pair-distinct runs on lineitem alone before any join.
    */
  def supplierCountByPart(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#4" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    pairs
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (dominant suppliers of promo parts): AMERICA
    * suppliers who shipped more than half of some 'blue…' part's 1996
    * volume. The correlated half-of-total test is decorrelated into a
    * per-part total joined back; the compare is the EXACT integral
    * rewrite `2*pair_qty > part_qty` (quantities are integral doubles,
    * sums < 2^53). Supplier membership via LEFT SEMI on the dominant
    * pairs.
    */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val bluep = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("blue"))
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(bluep), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("pair_qty"))
    val perPart = shipped.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("pair_qty")).as("part_qty"))
    val dominant = shipped.join(perPart,
        col("l_partkey") === col("pk") &&
        col("pair_qty") * 2 > col("part_qty"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir))
          .filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  /** Bloom-prefiltered join: build a Bloom filter over the small
    * (filtered) side's keys, probe it on the fact side BEFORE the
    * shuffle, then run the exact join — false positives are removed
    * by the join, so the result is exactly the plain join's (oracle-
    * checked) while the shuffle carries only might-match rows. This
    * is the explicit form of Spark's runtime row-level filtering; at
    * 100 TB it's the difference between shuffling the whole fact
    * table and shuffling ~selectivity of it. The probe is a native
    * codegen'd expression ([[graft.functions.BloomMightContain]]);
    * the two driver actions (count + filter build) scan only the
    * already-filtered dimension side.
    */
  def bloomPrefilteredJoin(spark: SparkSession, dir: String,
                           minBal: Double = 8000.0): DataFrame = {
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > minBal)
      .select(col("c_custkey"), col("c_mktsegment"))
    val bloom = rich.stat.bloomFilter("c_custkey",
      math.max(rich.count(), 1L), 0.01)
    Tables.orders(spark, dir)
      .filter(graft.functions.BloomMightContain.probe(col("o_custkey"), bloom))
      .join(rich, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(14,2)")), 2)
          .cast("double").as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for
    * finished orders, suppliers with a late line (shipdate >
    * orderdate + 45d — the fixture has no commit/receipt dates) where
    * ANOTHER supplier contributed a line and NO other supplier was
    * late. Granularity is distinct (order, supplier) so a supplier
    * counts once per order.
    *
    * The EXISTS/NOT-EXISTS pair collapses to per-order counts: a late
    * supplier qualifies iff the order has ≥ 2 suppliers and exactly 1
    * late one (necessarily itself). That makes the whole query ONE
    * shuffle: the lineitem⋈orders join partitions on l_orderkey, and
    * both the (orderkey, suppkey) aggregate and the per-order count
    * window are clustered by a subset of that key, so neither
    * re-exchanges. (The previous semi+anti form recomputed the joined
    * subtree three times and shuffled each copy — 3.4s → ~1s at
    * sf0.1.)
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"))
          .as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val byOrder = Window.partitionBy(col("l_orderkey"))
    lines
      .withColumn("n_supp", count(lit(1)).over(byOrder))
      .withColumn("n_late",
        sum(when(col("late"), 1L).otherwise(0L)).over(byOrder))
      .filter(col("late") && col("n_supp") >= 2 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }
}
