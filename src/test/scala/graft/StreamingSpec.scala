package graft

import graft.operators.TimeSeries
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming forms must agree with the oracle-checked batch forms on
  * the same events fixture.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts == batch hourly counts (complete mode)") {
    val batch = TimeSeries.hourlyEvents(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet

    val events = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    mem.addData(events.as[(java.sql.Timestamp, String, Double)].collect().toSeq)
    val streamed = Streaming.hourlyCounts(
      mem.toDF().toDF("ts", "event_type", "value"))
    val got = Streaming.runToMemory(spark, streamed, "hourly_out",
        OutputMode.Complete())
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == batch)
  }

  test("streaming minhash near-dup == batch minhash LSH pairs") {
    import graft.operators.Dedup
    val want = Dedup.minhashLsh(spark, sf, minJ = 0.2)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(want.nonEmpty)

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.DocEvent]
    val base = 1700000000000L
    mem.addData(docs.toSeq.map { case (id, t) =>
      Streaming.DocEvent(new java.sql.Timestamp(base + id), id, t)
    })
    val got = Streaming.runToMemory(spark,
        Streaming.nearDupStream(mem.toDS()).toDF(), "neardup_out",
        OutputMode.Append())
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap // band-duplicate hits collapse

    assert(got.keySet == want.keySet,
      s"missing=${want.keySet.diff(got.keySet)} extra=${got.keySet.diff(want.keySet)}")
    got.foreach { case (pair, j) =>
      assert(math.abs(j - want(pair)) < 1e-6, s"$pair: $j vs ${want(pair)}")
    }
  }

  test("stream-static join: streaming events enrich against a static dim") {
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((0L, "gold"), (1L, "silver"), (2L, "bronze"))
      .toDF("user_id", "tier") // static side
    val mem = MemoryStream[(Long, Double)]
    mem.addData(Seq((0L, 10.0), (1L, 5.0), (0L, 7.0), (2L, 1.0), (9L, 99.0)))
    val joined = mem.toDF().toDF("user_id", "value")
      .join(users, Seq("user_id")) // inner: unknown user 9 drops
      .groupBy(col("tier")).agg(sum(col("value")).as("total"))
    val got = Streaming.runToMemory(spark, joined, "ss_join_out",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      .as[(String, Double)].collect().toMap
    assert(got == Map("gold" -> 17.0, "silver" -> 5.0, "bronze" -> 1.0))
  }

  test("late data beyond the watermark is dropped from windowed aggs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val agg = Streaming.hourlyCounts(mem.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.outputMode(
        org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("late_out").start()
    // batch 1: events up to 12:00 → watermark advances to 10:00
    mem.addData(Seq(
      (ts("2024-01-01 05:30:00"), "click", 1.0),
      (ts("2024-01-01 12:00:00"), "click", 1.0)))
    q.processAllAvailable()
    // batch 2: an event at 05:45 — older than the 10:00 watermark
    mem.addData(Seq((ts("2024-01-01 05:45:00"), "click", 99.0)))
    q.processAllAvailable()
    // batch 3: advance far so every open window closes and emits
    mem.addData(Seq((ts("2024-01-02 00:00:00"), "click", 1.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late_out")
      .select("hour_start", "n").as[(String, Long)].collect().toMap
    // the 05:00 window emitted exactly 1 event — the late 05:45 row
    // was discarded, not merged
    assert(out("2024-01-01 05:00:00") == 1L)
    assert(out("2024-01-01 12:00:00") == 1L)
  }

  test("streaming dedup within watermark drops exact duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(Seq((t0, "a"), (t0, "a"), (t0, "b"), (t0, "a"), (t0, "c"), (t0, "b")))
    val deduped = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
    val got = Streaming.runToMemory(spark, deduped, "dedup_out",
        OutputMode.Append())
      .select("k").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b", "c"))
  }

  test("sessionize emits an idle user's open session via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val mem = MemoryStream[Streaming.Ev]
    val q = Streaming.sessionize(mem.toDS(), watermarkDelay = "10 minutes")
      .toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_timeout_out").start()
    // base offset keeps every event strictly above the initial
    // watermark (0), which would otherwise drop a t=0 row as late
    val t0 = 1000L * us
    // user 1: two events 10s apart → one session left OPEN
    mem.addData(Seq(Streaming.Ev(1L, 1L, t0), Streaming.Ev(1L, 2L, t0 + 10L * us)))
    q.processAllAvailable()
    // user 2 two hours later pushes the watermark far past user 1's
    // lastTs + 30min gap; the next batches process user 1's timeout
    mem.addData(Seq(Streaming.Ev(2L, 3L, t0 + 7200L * us)))
    q.processAllAvailable()
    mem.addData(Seq(Streaming.Ev(2L, 4L, t0 + 7300L * us)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_timeout_out")
      .select("user_id", "n_events", "start_micros", "end_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the OPEN session was emitted by the timeout path, with its real
    // bounds — not silently withheld
    assert(got.contains((1L, 2L, t0, t0 + 10L * us)), s"emitted: $got")
  }

  test("stream-stream interval join == batch interval join") {
    val batch = graft.operators.Joins.intervalClickPurchase(spark, sf)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("delta_us"))
      .as[(Long, Long, Long, Long)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    clicks.addData(ev.filter(_._3 == "click").map(e => (e._1, e._2, e._4)).toSeq)
    purchases.addData(ev.filter(_._3 == "purchase").map(e => (e._1, e._2, e._4)).toSeq)
    val joined = Streaming.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"))
    val got = Streaming.runToMemory(spark, joined, "ssj_out", OutputMode.Append())
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch, s"missing=${batch.diff(got).take(3)} extra=${got.diff(batch).take(3)}")
  }

  test("stateful sessionize == window-function sessionize") {
    val batch = TimeSeries.sessionize(spark, sf)
      .select(col("user_id"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet

    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Streaming.Ev]
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.Ev]
    mem.addData(evs.collect().toSeq)
    val sessions = Streaming.sessionize(mem.toDS())
    val emitted = Streaming.runToMemory(spark, sessions.toDF(), "sess_out",
        OutputMode.Append())
      .select(col("user_id"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    // append mode emits only CLOSED sessions; every emitted session
    // must match the batch result exactly
    assert(emitted.nonEmpty)
    assert(emitted.subsetOf(batch), s"${emitted.diff(batch).take(5)} not in batch")
  }

  test("streaming dedup keeps first copy, drops in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = Streaming.dedupStream(mem.toDF().toDF("ts", "payload"))
    val q = dedup.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    mem.addData(Seq(
      (ts("2024-01-01 10:00:00"), "alpha"),
      (ts("2024-01-01 10:00:30"), "alpha"), // dup within horizon → dropped
      (ts("2024-01-01 10:01:00"), "beta")))
    q.processAllAvailable()
    mem.addData(Seq(
      (ts("2024-01-01 10:02:00"), "alpha"), // still within horizon → dropped
      (ts("2024-01-01 10:03:00"), "gamma")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out")
      .select(col("payload")).as[String].collect().toSeq
    assert(got.sorted == Seq("alpha", "beta", "gamma"),
      s"got $got")
  }

  test("checkpoint recovery: dedup state survives a query restart") {
    // the failure-recovery contract a production ingest job relies
    // on: a stateful query stopped and RESTARTED from its checkpoint
    // must (1) not reprocess already-committed input and (2) restore
    // its operator state — a duplicate arriving AFTER the restart of
    // a payload seen BEFORE it must still be dropped. File source +
    // checkpointLocation + the idempotent writeBatch sink is the
    // exactly-once composition Streaming.writeBatch documents.
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-ckpt").toString
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    val t0 = 1700000000000L
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    def writeBatchFiles(rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "payload").repartition(1)
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("ts timestamp, payload string").parquet(src)
      val q = Streaming.dedupStream(stream)
        .select(col("digest"), col("payload"))
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch(Streaming.writeBatch(out) _)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    writeBatchFiles(Seq(ts(0) -> "alpha", ts(1) -> "beta", ts(2) -> "alpha"))
    runOnce()
    // restart: new duplicate of a pre-restart payload (in-horizon
    // event time) + one novel payload
    writeBatchFiles(Seq(ts(3) -> "alpha", ts(4) -> "gamma"))
    runOnce()
    val emitted = spark.read.parquet(out)
      .select(col("payload")).as[String].collect().toSeq
    // each payload exactly once across BOTH runs: the restart neither
    // re-emitted pre-restart input nor forgot the dedup state
    assert(emitted.sorted == Seq("alpha", "beta", "gamma"),
      s"emitted across restart: $emitted")
  }

  test("checkpoint recovery: near-dup state survives a query restart") {
    // the same stop-restart contract for the KEYED state of
    // nearDupStream (flatMapGroupsWithState): a document ingested
    // BEFORE the restart must still be flagged against by a near-dup
    // arriving AFTER it — i.e. the per-bucket (doc_id, digest-set)
    // state is restored from the checkpoint, in the r13 Array[Long]
    // payload format this operator writes
    val root = java.nio.file.Files
      .createTempDirectory("graft-neardup-ckpt").toString
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    val t0 = 1700000000000L
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    def writeDocs(rows: Seq[(java.sql.Timestamp, Long, String)]): Unit =
      rows.toDF("ts", "doc_id", "text").repartition(1)
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("ts timestamp, doc_id bigint, text string").parquet(src)
        .as[Streaming.DocEvent]
      val q = Streaming.nearDupStream(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch(Streaming.writeBatch(out) _)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    val dup = "spark streams keyed state across restarts with checkpoints"
    writeDocs(Seq((ts(0), 1L, dup),
      (ts(1), 2L, "an entirely different sentence about query planning")))
    runOnce()
    // restart: a near-dup of the PRE-restart doc 1 + one novel doc
    writeDocs(Seq((ts(2), 3L, dup),
      (ts(3), 4L, "novel text with no duplicate partner anywhere here")))
    runOnce()
    val pairs = spark.read.parquet(out)
      .select(col("a"), col("b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
    // the only pair is (1, 3): doc 1's bucket state survived the
    // restart; a per-band re-emit is fine (batch-candidate contract),
    // reprocessed input would instead re-pair nothing new
    assert(pairs.nonEmpty && pairs.toSet == Set((1L, 3L, 1.0)),
      s"pairs across restart: $pairs")
  }

  test("foreachBatch sink is idempotent: replaying a batch leaves results unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idem-sink").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch(Streaming.writeBatch(dir) _)
      .start()
    mem.addData(Seq((1L, "a"), (2L, "b")))
    q.processAllAvailable()
    mem.addData(Seq((3L, "c")))
    q.processAllAvailable()
    q.stop()
    def snapshot() = spark.read.parquet(dir)
      .select(col("k"), col("v"), col("batch_id"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val first = snapshot()
    assert(first.map(t => (t._1, t._2)) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(first.map(_._3).distinct.sorted == Seq(0L, 1L))
    // simulate the at-least-once replay of batch 1 (failure after the
    // sink wrote but before the checkpoint advanced): the re-delivered
    // batch must overwrite itself, not append
    Streaming.writeBatch(dir)(
      Seq((3L, "c")).toDF("k", "v"), 1L)
    Streaming.writeBatch(dir)(
      Seq((3L, "c")).toDF("k", "v"), 1L)
    assert(snapshot() == first, "replayed batch changed the sink contents")
  }

  test("streaming MG heavy hitters: superset under skew; exact when k covers") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def lastBuffers(events: Seq[Streaming.TokEvent], k: Int,
                    shards: Int, name: String): Map[Int, Map[String, Long]] = {
      val mem = MemoryStream[Streaming.TokEvent]
      val q = Streaming.heavyHitterStream(mem.toDS(), k, shards).toDF()
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name).start()
      // REAL micro-batches: add a chunk, drain it, then the next — so
      // GroupState must survive and resume across batch boundaries
      // (addData-everything-then-start would collapse into one batch
      // and never exercise the state carry-over path)
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { b =>
        mem.addData(b)
        q.processAllAvailable()
      }
      q.stop()
      val out = spark.table(name).as[Streaming.ShardCandidates].collect()
      // Update mode appends one row per shard per batch: keep the last
      out.zipWithIndex.groupBy(_._1.shard).view
        .mapValues(_.maxBy(_._2)._1.cands).toMap
    }
    // 1. zipf-skewed stream, small k: eviction exercised, and every
    //    token above the shard-local MG line survives in its shard
    val stream = (1 to 120).flatMap(i => Seq.fill(1200 / i)(s"w$i"))
    val events = stream.zipWithIndex.map { case (t, i) =>
      Streaming.TokEvent(new java.sql.Timestamp(base + i), t)
    }
    val k = 8; val shards = 4
    val bufs = lastBuffers(events, k, shards, "hh_skew_out")
    val byShard = stream.groupBy(t => math.floorMod(t.hashCode, shards))
    byShard.foreach { case (shard, toks) =>
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val must = truth.collect {
        case (w, c) if c > toks.length.toLong / k => w
      }.toSet
      assert(must.nonEmpty, s"degenerate shard $shard fixture")
      val cands = bufs.getOrElse(shard, Map.empty).keySet
      assert(must.subsetOf(cands), s"shard $shard missing ${must -- cands}")
      assert(bufs(shard).size <= k)
    }
    // 2. documents bigrams with k >= distinct-per-shard: no eviction,
    //    so streamed MG counts ARE the exact bigram counts — ties the
    //    stream to the oracle-checked batch heavy_hitters tokenization
    val bigrams = Tables.documents(spark, sf)
      .select(graft.functions.TextFns.wsTokens(lower(col("text"))).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), (x, i) -> concat(x, ' ', ts[i + 1]))"))
        .as("bg"))
      .as[String].collect()
    val bgEvents = bigrams.zipWithIndex.map { case (t, i) =>
      Streaming.TokEvent(new java.sql.Timestamp(base + i), t)
    }
    val bufs2 = lastBuffers(bgEvents, 4096, shards, "hh_exact_out")
    val exact = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(exact.size < 4096) // precondition for the no-eviction claim
    val merged = bufs2.values.flatten.toMap
    assert(merged == exact, "no-eviction MG must equal exact counts")
  }
}
