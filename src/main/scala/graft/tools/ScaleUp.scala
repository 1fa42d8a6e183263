package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an N× corpus from an SF dir: union N key-offset replicas of
  * every table (tiny dims region/nation copied once). Replica i
  * offsets each key column by i × (max_key + 1), computed from the
  * data, so FK relationships hold within every replica and replicas
  * are key-disjoint. This is the scale-slope smoke harness behind
  * PLANS.md's measured 10× sweep — testdata itself is read-only, so
  * the derived dirs live under /tmp.
  *
  * Semantics note for interpreting slopes: replication duplicates
  * CONTENT (text/embeddings) as well as rows, so duplicate-finding
  * operators see a corpus whose true duplicate structure is ~N× denser
  * per key — their OUTPUT grows faster than N by construction. The
  * slope of interest there is runtime vs candidate-pair count, not vs
  * raw rows; the linear-cost flagships (aggregation, joins, text
  * scoring) are the ones expected to track N directly.
  *
  * PERTURB mode (r15 verdict missing #5) makes the derived corpus
  * production-shaped for the pair-emitting operators: replica 0 stays
  * the untouched original (so fixed-delta probes against the 1× slice
  * match the 1× baseline), and every other replica gets
  *  - documents: a deterministic per-(replica, doc) token SHUFFLE plus
  *    a letter-only replica tag — the token MULTISET (wordcount, BM25
  *    stats, length/quality scores) stays corpus-shaped, but replicas
  *    share almost no shingles with their originals or each other, so
  *    near-dup output returns to ~natural density instead of N²;
  *  - embeddings: a deterministic per-(replica, vec, dim) epsilon
  *    (±0.01) — replicas stop being BIT-IDENTICAL, so the exact-
  *    collapse/grouping degeneracies disappear (cosine-near pairs
  *    remain: ±0.01 barely moves cosine, which is the honest
  *    production shape for replicated-ish embeddings).
  *
  * Usage: runMain graft.tools.ScaleUp <inSfDir> <outDir> <n> [perturb]
  */
object ScaleUp {

  /** Union n replicas of df, offsetting each (column → domain-size)
    * pair by rep × size. One scan: cross join against the tiny
    * replica-id range, then shift keys. `perturbF` (if any) runs
    * while `__rep` is still in scope.
    */
  private def replicate(df: DataFrame, n: Int,
                        offsets: Map[String, Long],
                        perturbF: Option[DataFrame => DataFrame] = None)
      : DataFrame = {
    val reps = df.sparkSession.range(n).toDF("__rep")
    val crossed = df.crossJoin(broadcast(reps))
    val shifted = offsets.foldLeft(crossed) { case (d, (c, size)) =>
      d.withColumn(c, col(c) + col("__rep") * size)
    }
    perturbF.fold(shifted)(f => f(shifted)).drop("__rep")
  }

  /** doc_id here is ALREADY key-shifted; keying the shuffle on it
    * (plus the replica and position) makes every replica's
    * permutation distinct. Letters only in the tag — the corpus
    * tokenizers are alpha-runs, digits would collapse.
    */
  private val docPerturb: DataFrame => DataFrame = d =>
    d.withColumn("text",
      when(col("__rep") === 0, col("text")).otherwise {
        // wsTokens (not a raw split): leading whitespace would inject
        // an empty pseudo-token into the shuffle
        val keyed = transform(
          graft.functions.TextFns.wsTokens(col("text")), (t, i) =>
          struct(
            xxhash64(concat_ws(":", col("__rep"), col("doc_id"),
              i.cast("string"), t)).as("k"),
            t.as("t")))
        concat_ws(" ",
          concat(lit("replicatag"),
            translate(col("__rep").cast("string"),
              "0123456789", "abcdefghij")),
          concat_ws(" ", transform(array_sort(keyed),
            s => s.getField("t"))))
      })

  private val embPerturb: DataFrame => DataFrame = d =>
    d.withColumn("embedding",
      when(col("__rep") === 0, col("embedding")).otherwise(
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(concat_ws(":", col("__rep"), col("vec_id"),
              i.cast("string"))), lit(1024L)).cast("float") - lit(512f)) /
            lit(51200f)).cast("float"))))

  private def maxPlus1(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || (args.length == 4 && args(3) == "perturb"),
      "usage: ScaleUp <inSfDir> <outDir> <n> [perturb]")
    val spark = Sessions.local("graft-scaleup")
    run(spark, args(0), args(1), args(2).toInt, perturb = args.length == 4)
    spark.stop()
  }

  def run(spark: SparkSession, in: String, out: String, n: Int,
          perturb: Boolean = false): Unit = {
    // r12: replicated tables are REPARTITIONED before the write. The
    // source SF tables are single-file, the broadcast cross join
    // preserves that partitioning, and until r12 every derived table
    // therefore landed as ONE parquet file — which serialized the map
    // side of every query in the scale sweep onto one core (probe:
    // the 10× doc tokenize+agg ran 1 task, 11 s where 32-way takes
    // ~1 s) and inflated every measured slope. A real N× corpus is
    // many files; 32 (one per local core) keeps the harness honest.
    def write(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")
    def writeDim(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")

    // key-domain sizes (max+1) from the source data
    val ck = maxPlus1(Tables.customer(spark, in), "c_custkey")
    val sk = maxPlus1(Tables.supplier(spark, in), "s_suppkey")
    val pk = maxPlus1(Tables.part(spark, in), "p_partkey")
    val ok = maxPlus1(Tables.orders(spark, in), "o_orderkey")
    val ek = maxPlus1(Tables.events(spark, in), "event_id")
    val uk = maxPlus1(Tables.events(spark, in), "user_id")
    val dk = maxPlus1(Tables.documents(spark, in), "doc_id")
    val vk = maxPlus1(Tables.embeddings(spark, in), "vec_id")

    writeDim(Tables.region(spark, in), "region")
    writeDim(Tables.nation(spark, in), "nation")
    write(replicate(Tables.customer(spark, in), n, Map("c_custkey" -> ck)), "customer")
    write(replicate(Tables.supplier(spark, in), n, Map("s_suppkey" -> sk)), "supplier")
    write(replicate(Tables.part(spark, in), n, Map("p_partkey" -> pk)), "part")
    write(replicate(Tables.orders(spark, in), n,
      Map("o_orderkey" -> ok, "o_custkey" -> ck)), "orders")
    write(replicate(Tables.lineitem(spark, in), n,
      Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk)), "lineitem")
    // Tables.events rebuilds the ns timestamp to TimestampType(µs);
    // the derived table is written with that schema and the loader
    // passes it through unchanged
    write(replicate(Tables.events(spark, in), n,
      Map("event_id" -> ek, "user_id" -> uk)), "events")
    write(replicate(Tables.documents(spark, in), n, Map("doc_id" -> dk),
      if (perturb) Some(docPerturb) else None), "documents")
    write(replicate(Tables.embeddings(spark, in), n, Map("vec_id" -> vk),
      if (perturb) Some(embPerturb) else None), "embeddings")

    println(s"SCALEUP wrote ${n}x of $in to $out" +
      (if (perturb) " (perturbed)" else ""))
  }
}
