package graft.tools

import graft.Sessions

/** Times the streaming near-dup contract replay at different corpus
  * fractions — the number behind the quarter-vs-full driver-row
  * decision (r12 verdict #7): the contract's cost is keyed-state
  * machinery (shingle digests cross the state shuffle once per band),
  * so the replay fraction is a disclosed cost/coverage trade.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> [everyNth ...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val fracs = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(4, 1)
    val spark = Sessions.local("graft-stream-probe")
    fracs.foreach { nth =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = graft.streaming.Streaming
          .nearDupContract(spark, dir, nth).collect()
        println(f"STREAM neardup[everyNth=$nth] run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"ok=${rows.forall(_.getBoolean(1))}")
      }
    }
    spark.stop()
  }
}
