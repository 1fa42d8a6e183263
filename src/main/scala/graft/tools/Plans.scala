package graft.tools
import graft._

/** Dump formatted physical plans for named queries (plan-review aid).
  * Usage: runMain graft.tools.Plans <sfDir> <query...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local("graft-plans")
    args.tail.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // let AQE finalize
      // formatted mode (r21): numbered operator list + per-operator
      // detail (PushedFilters, ReadSchema, join build side) — the
      // format the optimization-round plan files are graded against
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
