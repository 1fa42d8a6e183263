package graft.tools

import graft.{Sessions, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** One-off stage-cost probe for the dsir_sample rebuild: times the
  * tokenize/explode stream, the occurrence pre-agg, the vocabulary
  * agg, and the full pipeline, so the dominant linear term is
  * measured rather than guessed (r11 verdict item #2).
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("dsir-probe")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DSIRPROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextFns.wsTokens(lower(col("text"))).as("ts"))
    val grams = d.select(col("doc_id"), col("source"),
      explode(concat(col("ts"),
        zip_with(slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))).as("gram"))
    val docBuckets = grams.select(col("doc_id"), col("source"),
        pmod(conv(substring(md5(concat(lit("dsir:"), col("gram"))), 1, 13),
          16, 10).cast("long"), lit(256L)).as("bucket"))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    (1 to 2).foreach { _ =>
      time("grams_scan")(grams.count())
      time("docBuckets_agg")(docBuckets.count())
      val q = graft.operators.Curation.dsirSample(spark, dir)
      time("full_query")(q.count())
      val plan = q.queryExecution.executedPlan.toString
      println(s"DSIRPROBE reused_exchange_nodes=" +
        "ReusedExchange".r.findAllIn(plan).length +
        " shuffles=" + "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
