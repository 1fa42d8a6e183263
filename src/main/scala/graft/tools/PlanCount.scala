package graft.tools

import graft._

/** Dev tool: print deterministic (shuffle, broadcast) exchange counts
  * for registry queries with exchange/subquery REUSE DISABLED — the
  * history-independent numbers PlanLintSpec's golden budgets pin.
  * (With reuse enabled, a plan's printed exchange count depends on
  * which plans were canonicalized earlier in the session — AQE's
  * stage/canonicalization caching — so identical code can count 16 or
  * 24 shuffles depending on test order. Reuse-off counts the full
  * logical exchange set, stable across any construction history.)
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plancount")
    spark.conf.set("spark.sql.exchangeReuseEnabled", "false")
    spark.conf.set("spark.sql.execution.reuseSubquery", "false")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val eager = SparkEntry.eagerQueries
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(eager)
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      val s = "(?<!Broadcast)Exchange (hash|range|SinglePartition)".r
        .findAllIn(plan).length
      val b = "BroadcastExchange".r.findAllIn(plan).length
      println(s"""COUNT "$n" -> ($s, $b),""")
    }
    spark.stop()
  }
}
