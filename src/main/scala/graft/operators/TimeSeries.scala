package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the events table: tumbling windows,
  * sessionization, as-of join. The reference is batch-only
  * (SURVEY.md §2b "Streaming: absent") — these are the
  * oracle-checkable batch forms; the Structured Streaming variants
  * live in graft.streaming and share the same logic.
  *
  * NOTE on event timestamps: events.ts is parquet timestamp[ns];
  * Spark truncates to microseconds while DuckDB keeps TIMESTAMP_NS.
  * Every query here emits timestamps as formatted strings (second
  * precision) so the driver's hash compare never sees a precision
  * mismatch.
  */
object TimeSeries {

  /** Tumbling 1-hour window counts per event type — the batch
    * equivalent of the streaming windowed aggregation. window() is
    * epoch-aligned, so window.start == date_trunc('hour', ts).
    */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value")
      )
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value")
      )
      .orderBy("hour_start", "event_type")

  /** Sessionization with a 30-minute inactivity gap, expressed as
    * window functions (lag → new-session flag → running sum = session
    * id). One shuffle on user_id; scales linearly — the per-user
    * state is a sort within the partition, never a driver collect.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_end")
      )
      .orderBy("user_id", "session_id")
  }

  /** As-of join: for each purchase event, the most recent prior (or
    * simultaneous) signup by the same user. Implemented shuffle-once:
    * union the two tagged streams, sort per user by time, and carry
    * the last seen signup time forward with last(ignoreNulls) — no
    * per-row range probe, no driver state. This is the standard
    * scalable as-of pattern (one exchange + one sort).
    */
  def asofPurchaseSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tagged = ev.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      when(col("event_type") === "signup", col("ts")).as("signup_ts")
    )
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_signup", last(col("signup_ts"), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
        date_format(col("last_signup"), "yyyy-MM-dd HH:mm:ss").as("signup_at")
      )
      .orderBy("user_id", "event_id")
  }

  /** Ordered-funnel analysis: how many users performed the stage
    * sequence IN ORDER (each stage strictly after the previous
    * stage's first occurrence), with per-stage conversion — the
    * classic product-analytics query. Semantics: a user reaches
    * stage k at the EARLIEST event of type k after their stage-k−1
    * reach time (first-touch funnel).
    *
    * 100 TB shape: each stage is one type-filtered scan (the
    * event_type predicate pushes into the parquet read) aggregated to
    * one row per user, then a user-keyed join with the previous
    * stage's reach times — joins carry (user_id, timestamp) pairs,
    * never raw events. The final conversion window runs over
    * #stages rows.
    */
  def eventFunnel(spark: SparkSession, dir: String,
                  stages: Seq[String] = Seq("view", "click", "purchase"))
      : DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val reached = stages.tail.scanLeft(first) { (prev, st) =>
      ev.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col("t").as("prev_t")), "user_id")
        .filter(col("ts") > col("prev_t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    val counts = reached.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(st).as("stage"), col("n_users"))
    }.reduce(_ union _)
    val w = Window.orderBy(col("stage_idx")) // #stages rows — tiny
    counts
      .withColumn("prev_n",
        coalesce(lag(col("n_users"), 1).over(w), col("n_users")))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(col("n_users") / col("prev_n").cast("double"), 6).as("conv_rate"))
      .orderBy("stage_idx")
  }

  /** Gap-fill + linear interpolation: resample events to an hourly
    * grid per event_type (min..max hour of that series), mark missing
    * hours, and fill them by interpolating linearly between the
    * nearest observed neighbors (last/first with ignoreNulls over the
    * densified grid). Grid endpoints are observed hours, so every gap
    * has both neighbors and the interpolation is total.
    *
    * Scale: the heavy input pass is the fully-parallel hourly
    * pre-aggregation; the windows then run over the AGGREGATED series
    * (#types × #hours rows — bounded by calendar time, not data
    * volume), so the per-type partition never sees raw events. Hourly
    * sums are rounded to 3 decimals BEFORE interpolating so the
    * oracle interpolates from bit-identical inputs. The interpolation
    * weight is a ratio of whole-second long deltas cast to double —
    * the same two casts and single division DuckDB performs.
    */
  /** As-of NEAREST join with tolerance (pandas merge_asof
    * direction="nearest"): each purchase pairs with the closest click
    * by the same user within ±15 minutes, looking BOTH directions —
    * unlike [[asofPurchaseSignup]], which is backward-only. Same
    * single-shuffle posture: one sort per user partition feeds both
    * direction windows; ties (equidistant prev/next) resolve to the
    * earlier click in both engines.
    */
  def asofNearest(spark: SparkSession, dir: String,
                  toleranceSec: Long = 900): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val clickTs = when(col("event_type") === "click", col("ts"))
    val dp = unix_micros(col("ts")) - unix_micros(col("prev_click"))
    val dn = unix_micros(col("next_click")) - unix_micros(col("ts"))
    val gapUs = least(coalesce(dp, dn), coalesce(dn, dp))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev_click", last(clickTs, ignoreNulls = true)
        .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_click", first(clickTs, ignoreNulls = true)
        .over(byUser.rowsBetween(1, Window.unboundedFollowing)))
      .where(col("event_type") === "purchase")
      .where(gapUs.isNotNull && gapUs <= toleranceSec * 1000000L)
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
        date_format(
          when(dp.isNotNull && (dn.isNull || dp <= dn), col("prev_click"))
            .otherwise(col("next_click")),
          "yyyy-MM-dd HH:mm:ss").as("nearest_click"),
        // exact for gaps < 2^53 µs; floor(x/1e6) == x div 1e6 for x ≥ 0
        floor(gapUs / 1000000L).cast("long").as("gap_s"))
      .orderBy("user_id", "event_id")
  }

  /** Sessionization via Spark's native session_window operator (the
    * dedicated SessionWindow exec, not the lag/cumsum window form in
    * [[sessionize]]): sessions merge while each event lands inside
    * the previous window's [start, last+gap) extent, and the emitted
    * window end is last event + gap. Both forms are oracle-checked
    * against the same DuckDB recurrence, pinning them equal.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"), col("n_events"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"))
      .orderBy("user_id", "sess_start")

  /** Weekly cohort retention (the product-analytics matrix): users
    * cohort by the ISO week of their first event; each later active
    * week counts them once at that offset; retention = active / cohort
    * size. Two shuffles (per-user first week, per-cohort-offset
    * distinct count) + a broadcast of the tiny cohort-size table —
    * user-level state never leaves its partition. On the synthetic
    * fixture all users land in one cohort (every user is active from
    * week 1); the shape is what matters and the oracle replays it.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
    val first = e.groupBy("user_id").agg(min(col("w")).as("cohort_w"))
    val sizes = first.groupBy("cohort_w").agg(count(lit(1)).as("cohort_n"))
    e.join(first, "user_id")
      .select(col("cohort_w"),
        expr("CAST(datediff(w, cohort_w) div 7 AS BIGINT)").as("offset_w"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_w", "offset_w")
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), "cohort_w")
      .select(
        date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
        col("offset_w"), col("n_users"), col("cohort_n"),
        round(col("n_users") / col("cohort_n").cast("double"), 6).as("retention"))
      .orderBy("cohort_week", "offset_w")
  }

  /** Rolling z-score anomaly detection over the hourly series: each
    * hour is scored against the trailing 24-hour window (mean and
    * sample stddev over the 24 PRECEDING rows, current row excluded
    * so a spike can't mask itself). Rows need ≥ 12 trailing hours and
    * positive spread to be scorable. The anomaly flag compares the
    * ROUNDED z-score against the threshold so both engines decide
    * from bit-identical inputs (same discipline as ts_fill).
    *
    * Scale: identical posture to gapFill — the rolling window runs
    * over the aggregated hourly series, never raw events.
    */
  def anomalies(spark: SparkSession, dir: String,
                threshold: Double = 2.5): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value")), 3).as("v"))
    val win = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-24, -1)
    val z = round((col("v") - col("mu")) / col("sd"), 4)
    hourly
      .withColumn("mu", round(avg(col("v")).over(win), 6))
      .withColumn("sd", round(stddev_samp(col("v")).over(win), 6))
      .withColumn("nw", count(lit(1)).over(win))
      .where(col("nw") >= 12 && col("sd") > 0)
      .select(
        col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("v"), z.as("zscore"),
        (abs(z) > threshold).as("is_anomaly"))
      .orderBy("event_type", "hour_start")
  }

  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value")), 3).as("v"))
    val grid = hourly.groupBy("event_type")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val wPrev = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(0, Window.unboundedFollowing)
    val obsH = when(col("v").isNotNull, col("h"))
    val frac =
      (unix_timestamp(col("h")) - unix_timestamp(col("prev_h"))).cast("double") /
      (unix_timestamp(col("next_h")) - unix_timestamp(col("prev_h"))).cast("double")
    grid.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_h", last(obsH, ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("next_h", first(obsH, ignoreNulls = true).over(wNext))
      .select(
        col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        when(col("v").isNotNull, 0L).otherwise(1L).as("filled"),
        round(
          when(col("v").isNotNull, col("v"))
            .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) * frac),
          3).as("v_filled"))
      .orderBy("event_type", "hour_start")
  }

  /** M4 downsampling — the standard visually-lossless time-series
    * reduction (Jugel et al., VLDB 2014): per (series, time bucket)
    * keep exactly four values — first, last, min, max — which is
    * sufficient to render the series' pixel-exact line at the
    * bucket's resolution. first/last use min_by/max_by on a
    * lexicographic `strftime(µs)|zero-padded event_id` key, so the
    * within-bucket order (and every tie) is decided identically by
    * both engines.
    *
    * Scale: ONE partial→final aggregate over the event stream — all
    * four statistics are algebraic, so executors combine map-side and
    * the shuffle carries #series × #buckets rows. This is the shape
    * that makes "plot 3 years of a 100 TB metric store" feasible.
    */
  def m4Downsample(spark: SparkSession, dir: String): DataFrame = {
    val okey = concat(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      lit("|"), lpad(col("event_id").cast("string"), 12, "0"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("value")), 3).as("min_v"),
        round(max(col("value")), 3).as("max_v"),
        round(min_by(col("value"), okey), 3).as("first_v"),
        round(max_by(col("value"), okey), 3).as("last_v"))
      .orderBy("event_type", "bucket")
  }
}
