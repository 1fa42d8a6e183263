package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's flagship workload: word count, in both
  * physical variants the reference ships.
  *
  * Reference semantics:
  *  - Go engine: alpha-run tokenize + count per word
  *    (internal/worker/worker.go:24-44).
  *  - Legacy Hadoop hw02: whitespace tokenize + regex filter
  *    `^[m-qM-Q]` + sum, custom 5-way first-letter partitioner
  *    (legacy/.../hw02/WordCountNoCombiner.java:31,39-52).
  *
  * Spark-first: scan → explode → filter → partial+final hash agg →
  * sort. The combiner / in-mapper-tally variants of the reference
  * (hw02) are subsumed by HashAggregateExec's partial aggregation —
  * map-side combine is automatic and spillable.
  */
object WordCount {

  /** Alpha-run word count over documents.text (Go engine semantics). */
  def alpha(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .select(explode(TextFns.alphaTokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** hw02 semantics: whitespace tokens, keep words starting m–q (any
    * case), count, 5 range partitions by first letter. The partition
    * routing of the reference's WordPartitioner is physical-only (it
    * never changes results) — `repartitionByRange(5, ...)` is the
    * idiomatic Spark form and keeps the 5-way layout for the writer.
    */
  def filtered(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .select(explode(TextFns.wsTokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[m-qM-Q]"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(5, col("word"))
      .sortWithinPartitions("word")
  }

  /** UDTF-surface demo: the same tokenize expressed as a typed
    * Dataset.flatMap — the shape of the reference's user-supplied
    * MapFunc (worker.go:24: `func(filename, contents) []KeyValue`).
    * Produces per-document token stats rather than a global count so
    * the flatMap output is exercised beyond what explode covers.
    */
  def flatMapTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split("[^a-zA-Z]+").iterator.filter(_.nonEmpty).map(w => (id, w))
      }
      .toDF("doc_id", "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_distinct")
      )
      .orderBy("doc_id")
  }
}
