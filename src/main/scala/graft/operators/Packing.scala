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
    * exactly once, dense ids, determinism, plan shape) instead, and
    * [[seqPackSql]] is the oracle-hash-checked prefix-sum twin.
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

  /** Prefix-sum packing, the DuckDB-checkable twin of [[seqPack]]:
    * bin = exclusive-cumsum(n_tok) div budget over doc_id order
    * within each source — concatenate-then-split semantics. Unlike
    * the greedy exec a bin may overflow by one document's tail
    * (bounded by max(n_tok) − 1 tokens), but the assignment is a pure
    * prefix sum, so DuckDB replays it bit-for-bit and the whole row
    * set oracle-hash-checks. Integer `div` keeps the bin id exact in
    * both engines — no float division anywhere.
    *
    * 100 TB shape: the only state is a cumsum window PARTITIONED BY
    * source, so per-task state is one source's token counts, never
    * the corpus; the aggregation is an ordinary partial-agg groupBy.
    * PackingSpec cross-checks density against the greedy exec:
    * nBins(sql) ≤ nBins(greedy) + #sources (the prefix-sum split is
    * the densest document-boundary packing modulo source boundaries).
    */
  def seqPackSql(spark: SparkSession, dir: String, budget: Long = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        TextFns.nTokens(col("text")).cast("long").as("n_tok"))
      .withColumn("cum0", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", expr(s"cum0 div $budget"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("source", "bin")
  }

  /** Length-bucketed batch packing — the padding-efficiency step of a
    * training dataloader: documents batched by similar token length
    * pad to the batch max, so mixing a 10-token doc into a 500-token
    * batch wastes 490 slots. Buckets are GLOBAL length quartiles
    * (exact interpolated percentiles — a 1-row broadcast both engines
    * compute identically on integer token counts); batches form
    * WITHIN (shard, bucket), where the shard is the md5-keyed
    * training shard (same family as [[Curation.sampleSplit]]), in
    * deterministic shuffle-key order. Output is per-batch padding
    * accounting: `padding_waste` = n_docs·max_tok − Σtok is the
    * number of pad tokens the batch burns.
    *
    * 100 TB shape: the quartile agg is one partial-agg pass to a
    * 1-row broadcast; shard/bucket/batch assignment is pure map-side
    * column math plus a window bounded by (shard, bucket) — nShards
    * scales with the corpus (fixture: 8), so no corpus-sized
    * partition funnel exists; the final rollup is a partial agg on
    * (shard, bucket, batch).
    */
  def batchPack(spark: SparkSession, dir: String,
                nShards: Int = 8, batchSize: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "bucket").orderBy("k", "doc_id")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextFns.nTokens(col("text")).cast("long").as("n_tok"),
        md5(concat(lit("batch:"), col("doc_id").cast("string"))).as("k"))
    // exact global quartiles of the integer token counts: linear
    // interpolation over integers is the same arithmetic in both
    // engines (the sketch_approx precedent)
    val qs = toks.agg(
      expr("percentile(n_tok, array(0.25d, 0.5d, 0.75d))").as("q"))
    toks.crossJoin(broadcast(qs))
      .select(col("doc_id"), col("n_tok"), col("k"),
        Curation.shardOf(col("k"), nShards).as("shard"),
        (when(col("n_tok") <= col("q").getItem(0), 0L)
          .when(col("n_tok") <= col("q").getItem(1), 1L)
          .when(col("n_tok") <= col("q").getItem(2), 2L)
          .otherwise(3L)).as("bucket"))
      .withColumn("batch",
        // integer division via truncating cast (row numbers are
        // positive); built from the single Window spec above so the
        // partitioning/ordering exists in exactly one place
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("shard"), col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .select(col("shard"), col("bucket"), col("batch"), col("n_docs"),
        col("max_tok"), col("sum_tok"),
        (col("n_docs") * col("max_tok") - col("sum_tok")).as("padding_waste"))
      .orderBy("shard", "bucket", "batch")
  }
}
