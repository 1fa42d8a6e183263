package graft.operators

import graft.Tables
import graft.functions.TextFns
import graft.plans.PackSequences
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing API over the custom [[graft.plans.PackSequences]]
  * operator (see its Scaladoc for the distributed-greedy semantics).
  */
object Packing {

  /** Append a dense `bin_id` column assigning each row to a token-
    * budget bin: rows are range-partitioned and sorted by `keyCol`,
    * each partition packs greedily, bin ids are globally unique.
    * `tokenCol` must be an integral column.
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    val binId = AttributeReference("bin_id", LongType, nullable = false)()
    GraftSqlShims.ofRows(df.sparkSession,
      PackSequences(budget, attr(tokenCol), attr(keyCol), binId, lp))
  }

  /** Registry entry: pack the documents table into 512-token context
    * windows and report per-bin stats. No SQL oracle — greedy packing
    * is a sequential recurrence DuckDB can't express declaratively;
    * PackingSpec pins the invariants (budget respected, partition
    * exactly once, dense ids, determinism, plan shape) instead.
    */
  def seqPack(spark: SparkSession, dir: String, budget: Long = 512): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.nTokens(col("text")).as("n_tok"))
    packSequences(docs, "doc_id", "n_tok", budget)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("bin_id")
  }
}
