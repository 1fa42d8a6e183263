package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Invariants for the custom PackSequences operator. Greedy packing
  * is a sequential recurrence DuckDB can't express, so these pin the
  * contract instead of a SQL oracle:
  *   - every row lands in exactly one bin
  *   - no bin exceeds the token budget (unless a single row does)
  *   - bin ids are dense 0..nBins-1 and follow key order
  *   - result is deterministic across runs
  *   - the plan contains exactly one exchange (the range partition)
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 512L

  private def packed = Packing.packSequences(
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFns.nTokens(col("text")).as("n_tok")),
    "doc_id", "n_tok", budget)

  test("every doc packed exactly once") {
    val docs = graft.Tables.documents(spark, sf).count()
    val out = packed
    assert(out.count() == docs)
    assert(out.select("doc_id").distinct().count() == docs)
  }

  test("no bin exceeds the budget unless a single row does") {
    val over = packed.groupBy("bin_id")
      .agg(sum(col("n_tok").cast("long")).as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > budget && col("n") > 1)
      .count()
    assert(over == 0L)
  }

  test("bin ids are dense and ordered by key") {
    val bins = packed.select("bin_id").distinct().orderBy("bin_id")
      .as[Long].collect()
    assert(bins.sameElements(bins.indices.map(_.toLong)), "bin ids not dense from 0")
    // within key order, bin id is non-decreasing
    val viol = packed.orderBy("doc_id")
      .select(col("bin_id"))
      .as[Long].collect()
      .sliding(2).count { case Array(a, b) => b < a; case _ => false }
    assert(viol == 0, "bin_id decreased along key order")
  }

  test("deterministic across runs") {
    val a = packed.orderBy("doc_id").collect()
    val b = packed.orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("plan has exactly one exchange (range partition under the pack node)") {
    val phys = packed.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(phys).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$phys")
    assert(phys.contains("PackSequences"), phys)
    assert(phys.contains("rangepartitioning"), phys)
  }

  test("registry seq_pack aggregates per bin") {
    val df = Packing.seqPack(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // total_tokens respects budget for multi-doc bins
    assert(rows.forall { r =>
      r.getAs[Long]("n_docs") == 1L || r.getAs[Long]("total_tokens") <= budget
    })
  }

  test("prefix-sum twin seq_pack_sql: same corpus totals, density within bounds") {
    val greedy = Packing.seqPack(spark, sf).collect()
    val sql = Packing.seqPackSql(spark, sf).collect()
    assert(sql.nonEmpty)
    // identical token mass: both pack every document exactly once
    val totG = greedy.map(_.getAs[Long]("total_tokens")).sum
    val totS = sql.map(_.getAs[Long]("total_tokens")).sum
    assert(totG == totS, s"token mass differs: greedy=$totG sql=$totS")
    val docsG = greedy.map(_.getAs[Long]("n_docs")).sum
    val docsS = sql.map(_.getAs[Long]("n_docs")).sum
    assert(docsG == docsS, s"doc count differs: greedy=$docsG sql=$docsS")
    // density: the prefix-sum split is the densest document-boundary
    // packing per source, so modulo source boundaries it never needs
    // more bins than budget-respecting greedy
    val nSources = sql.map(_.getAs[String]("source")).distinct.length
    assert(sql.length <= greedy.length + nSources,
      s"sql bins=${sql.length} greedy bins=${greedy.length} sources=$nSources")
    // straddle bound: a bin covers a budget-sized token interval, so
    // its total can overflow only by one document's tail
    val maxTok = graft.Tables.documents(spark, sf)
      .select(max(graft.functions.TextFns.nTokens(col("text")).cast("long")))
      .as[Long].head()
    assert(sql.forall(_.getAs[Long]("total_tokens") <= budget + maxTok - 1),
      "a prefix-sum bin overflowed beyond one document's tail")
  }
}
