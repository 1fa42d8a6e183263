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
  * Usage: runMain graft.tools.ScaleUp <inSfDir> <outDir> <n>
  */
object ScaleUp {

  /** Union n replicas of df, offsetting each (column → domain-size)
    * pair by rep × size. One scan: cross join against the tiny
    * replica-id range, then shift keys.
    */
  private def replicate(df: DataFrame, n: Int,
                        offsets: Map[String, Long]): DataFrame = {
    val reps = df.sparkSession.range(n).toDF("__rep")
    val crossed = df.crossJoin(broadcast(reps))
    val shifted = offsets.foldLeft(crossed) { case (d, (c, size)) =>
      d.withColumn(c, col(c) + col("__rep") * size)
    }
    shifted.drop("__rep")
  }

  private def maxPlus1(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inSfDir> <outDir> <n>")
    val spark = Sessions.local("graft-scaleup")
    run(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }

  def run(spark: SparkSession, in: String, out: String, n: Int): Unit = {
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
    write(replicate(Tables.documents(spark, in), n, Map("doc_id" -> dk)), "documents")
    write(replicate(Tables.embeddings(spark, in), n, Map("vec_id" -> vk)), "embeddings")

    println(s"SCALEUP wrote ${n}x of $in to $out")
  }
}
