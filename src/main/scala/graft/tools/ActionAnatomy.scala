package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Diagnostic (never part of any gate): dissects where the wall-clock
  * of one warm index serve goes — driver planning vs job execution —
  * by comparing total wall time against the sum of job durations from
  * a listener. Also times a trivial action at several shuffle widths
  * to put a floor under "one tiny Spark job".
  * Usage: runMain graft.tools.ActionAnatomy <sfDir>
  */
object ActionAnatomy {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("graft-anatomy")
    @volatile var jobMs = 0L
    @volatile var jobs = 0
    // (startNs, endNs) per finished job — lets `timed` report the
    // interval-UNION of job time alongside the sum: sum > union means
    // jobs genuinely overlapped (the §2.6 concurrent-jobs evidence,
    // e.g. the parallel index writes inside a foreachBatch body)
    val spans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    val stageDetail = args.contains("stages")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != null) { jobMs += (System.nanoTime() - s) / 1000000L
            jobs += 1
            spans.add((s.longValue(), System.nanoTime())); () }
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = if (stageDetail) {
          val i = s.stageInfo
          val dur = (for { a <- i.submissionTime; b <- i.completionTime }
            yield b - a).getOrElse(-1L)
          if (dur > 200)
            println(f"  STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d " +
              f"dur=${dur / 1e3}%7.2f s  ${i.name.takeWhile(_ != '\n')}")
        }
      })
    def timed(label: String)(f: => Unit): Unit = {
      jobMs = 0L; jobs = 0; spans.clear()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(150)
      // union of job intervals: sum − union = time covered by ≥2
      // concurrent jobs (0 ⇒ strictly sequential actions)
      val iv = spans.toArray(Array.empty[(Long, Long)]).sortBy(_._1)
      var union = 0L; var curS = 0L; var curE = -1L
      iv.foreach { case (s, e) =>
        if (s > curE) { union += (curE - curS) max 0L; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      union += (curE - curS) max 0L
      val overlap = (jobMs / 1e3) - (union / 1e9)
      println(f"ANATOMY $label: wall=$wall%.3f s jobs=$jobs jobTime=${jobMs / 1e3}%.3f s driverGap=${wall - jobMs / 1e3}%.3f s overlap=$overlap%.3f s")
    }
    // optional conf overrides: GRAFT_TUNE_CONF="k=v;k=v"
    sys.env.get("GRAFT_TUNE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    // named-query mode: runMain ... <sfDir> q <name...> times each
    // registry query twice (cold, warm) with the job/driver split
    if (args.length > 1 && args(1) == "q") {
      args.drop(2).filterNot(_ == "stages").foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        (1 to 2).foreach { i =>
          timed(s"$n run$i") { fn(spark, dir).count(); () }
        }
      }
      spark.stop()
      return
    }
    // floor: trivial narrow + one-exchange actions
    (1 to 3).foreach { i =>
      timed(s"trivial-narrow run$i") {
        spark.range(1000).toDF("id").agg(sum(col("id"))).count(); ()
      }
      timed(s"trivial-shuffle run$i") {
        spark.range(1000).toDF("id").groupBy(pmod(col("id"), lit(7)))
          .agg(sum(col("id"))).count(); ()
      }
    }
    // one warm near-dup lookup on the fold fixture shape
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 500 && pmod(col("doc_id"), lit(10)) < 3)
    val idx = s"/tmp/graft_anatomy_nd"
    graft.operators.Dedup.neardupWriteIndex(spark, docs, idx)
    val probe = docs.filter(pmod(col("doc_id"), lit(9)) === 4)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    (1 to 4).foreach { i =>
      timed(s"nd-lookup run$i") {
        graft.operators.Dedup.neardupLookup(spark, idx, probe)
          .collect(); ()
      }
    }
    // same at 8 shuffle partitions (the drill rows' width)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    (1 to 4).foreach { i =>
      timed(s"nd-lookup-8p run$i") {
        graft.operators.Dedup.neardupLookup(spark, idx, probe)
          .collect(); ()
      }
    }
    // with driver-side sequential partition discovery
    spark.conf.set(
      "spark.sql.sources.parallelPartitionDiscovery.threshold", "9999")
    (1 to 4).foreach { i =>
      timed(s"nd-lookup-seqdisc run$i") {
        graft.operators.Dedup.neardupLookup(spark, idx, probe)
          .collect(); ()
      }
    }
    // and with AQE off on top
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 4).foreach { i =>
      timed(s"nd-lookup-seqdisc-noaqe run$i") {
        graft.operators.Dedup.neardupLookup(spark, idx, probe)
          .collect(); ()
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // bm25 serve
    val bm = s"/tmp/graft_anatomy_bm"
    graft.operators.TextAnalysis.bm25WriteIndexDocs(spark, docs, bm)
    (1 to 4).foreach { i =>
      timed(s"bm25-serve-8p run$i") {
        graft.operators.TextAnalysis.bm25QueryIndex(spark, bm,
          Seq("data", "model", "system"), 20).collect(); ()
      }
    }
    spark.stop()
  }
}
