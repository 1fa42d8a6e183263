package graft
object Bench {
  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // untimed warmup: loads Spark's codegen/shuffle/parquet classes so
    // the first timed query isn't charged ~4s of one-time JVM setup
    // (a long-running cluster is always warm; per-query times stay real)
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().count()
      // also touch the JSON-parse and window codegen paths: their
      // one-time class loading otherwise lands on whichever query
      // alphabetically hits them first (measured ~5s on json_extract)
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.range(1000).toDF("id")
        .select(get_json_object(concat(lit("{\"k\":"), col("id"), lit("}")), "$.k")
          .cast("long").as("k"))
        .select(sum(col("k")).over(Window.orderBy("k")).as("s"))
        .count()
    } catch { case _: Throwable => () } // warmup must never kill the run
    // Each query is timed in TWO SUITE-LEVEL passes and the per-query time
    // is the MIN of the two. A single-shot timing is fragile to host
    // contention: a noisy co-tenant once tripled the recorded total with no
    // code change (BENCH_r06: driver 437s vs clean re-run 149.8s on the same
    // commit). Round 7's per-query back-to-back min-of-2 still lost to a
    // multi-minute contention window — both passes of several adjacent
    // queries ran inside it (BENCH_r07: sim_ann 165.9s on BOTH passes vs
    // 1.58s clean). Suite-level passes separate a query's two timings by the
    // full suite duration (~minutes), so one transient window can poison at
    // most one pass of any query; min-of-2 then recovers the clean figure.
    // Both raw passes are emitted ("pass1"/"pass2") so a contended run stays
    // visible in the record instead of silently poisoning it. A failed query
    // is reported as an error entry and fails the whole run (nonzero exit),
    // never as a silent fast timing.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop this query's cached/checkpointed blocks before the next
      // one runs: 19 operators localCheckpoint and several .cache(),
      // and two full registry passes of accumulated blocks otherwise
      // squeeze the 8g heap's storage pool all suite long —
      // late-alphabet queries then pay eviction + GC instead of their
      // own cost (BENCH_r09: sem_dedup_keep 273 s driver vs ~5 s
      // clean-warm on the same commit). clearCache() both unpersists
      // AND deregisters SQL-cached fragments (a bare RDD unpersist
      // would leave dangling CacheManager entries that later
      // identical plans substitute as dead, never-re-stored caches);
      // the RDD sweep then catches localCheckpoint blocks, which the
      // CacheManager doesn't track. Cleanup runs AFTER the timing
      // stop, and BLOCKING (r11): non-blocking removal let block
      // deletion + GC overlap the NEXT query's timed window — the
      // wait belongs between timers, not inside the next one.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      (dt, err)
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passOne = ordered.map { case (name, fn) => (name, timeOnce(fn)) }
    // pass 2 re-runs the WHOLE suite (skipping queries that failed — their
    // time is meaningless anyway), so each query's second timing lands far
    // from its first in wall-clock.
    val passTwo = ordered.zip(passOne).map { case ((name, fn), (_, (t1, e1))) =>
      if (e1.isDefined) (name, (t1, e1)) else (name, timeOnce(fn))
    }
    // (name, minSec, pass1Sec, pass2Sec, error)
    val results = passOne.zip(passTwo).map { case ((name, (t1, e1)), (_, (t2, e2))) =>
      (name, math.min(t1, t2), t1, t2, e1.orElse(e2))
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val p1 = results.map { case (k, _, t1, _, _) => "\"" + k + "\":" + t1 }
      .mkString("{", ",", "}")
    val p2 = results.map { case (k, _, _, t2, _) => "\"" + k + "\":" + t2 }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) => "\"" + k + "\":" + jsonStr(e) }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    // contention self-flagging (r17 verdict #6): a query whose two
    // suite-level passes disagree by >1.5× was co-tenant-poisoned in
    // one of them (min-of-2 already recovers the clean figure; the
    // flag makes the poisoned record self-identify instead of needing
    // forensic adjudication against a clean re-run). Two filters keep
    // the list signal, not noise: a 0.3 s floor (sub-second jitter),
    // and for PASS-1-heavy disparity only queries outside
    // eagerQueries — the eager rows legitimately pay their one-time
    // per-JVM fixture builds in pass 1 (the pass1/pass2 maps above
    // still record that asymmetry verbatim). Pass-2-heavy disparity
    // is unambiguous contention for every query.
    val contended = results.collect {
      case (k, _, t1, t2, None)
        if math.max(t1, t2) > 0.3 &&
          math.max(t1, t2) / math.max(math.min(t1, t2), 1e-9) > 1.5 &&
          (t2 > t1 || !SparkEntry.eagerQueries.contains(k)) =>
        "\"" + k + "\""
    }
    val contJson =
      if (contended.isEmpty) "" else contended.mkString(""","contended":[""", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","timing":"min_of_2_suite_passes","queries":$qs,"pass1":$p1,"pass2":$p2$errJson$contJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
