package graft.tools
import graft._

/** Ad-hoc per-query profiler: runs named queries 3 times and prints
  * timings (first = cold, rest = warm). Usage:
  *   runMain graft.tools.Profile <sfDir> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = Sessions.local("graft-profile")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"PROFILE $n%s run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      }
    }
    spark.stop()
  }
}
