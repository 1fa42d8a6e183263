package graft.tools

import graft.Sessions

/** Fixed-delta scale probe of the two-round ingest funnel — the
  * [[CheckinProbe]] pattern over [[graft.operators.Curation
  * .ingestPipeline2]]'s stages: same 1×-sized delta (cap = the 1×
  * corpus's doc_id domain) against 1×/10×/100× corpora. The funnel's
  * round wall-clock should stay ~flat while the one corpus-sized cost
  * (the v1 index builds, timed separately) scales with N.
  *
  * Usage: runMain graft.tools.IngestProbe <sfDir> [deltaCap]
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: IngestProbe <sfDir> [deltaCap]")
    val dir = args.head
    val cap = if (args.length > 1) args(1).toLong else Long.MaxValue
    val spark = Sessions.local("graft-ingest-probe")
    graft.operators.Curation.ingestProbe(spark, dir, cap)
    spark.stop()
  }
}
