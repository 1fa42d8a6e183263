package graft.tools
import graft._
import org.apache.spark.sql.functions._

object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("mh-debug")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.wordShingles(col("text"), 3)).as("shingle"))
      .distinct()
    time("shingles_distinct")(sh.count())
    time("shingles_again")(sh.count())
    val justset = sh.groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("s"))
    time("collect_set_only")(justset.count())
    val mins = (0 until 32).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    val minsOnly = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("mins_only")(minsOnly.count())
    val both = sh.groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("s"), mins: _*)
    time("both")(both.count())
    time("both_again")(both.count())
    spark.stop()
  }
}
