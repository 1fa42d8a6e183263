package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Raw sketch-contract numbers for stderr: sketch_hll_merge /
    * sketch_kll_merge hash only BOOLEANS (the raw estimates are
    * randomized per run — KLL compaction, HLL dense-mode error), so a
    * red driver gate on those rows would otherwise be undiagnosable
    * as sketch noise vs a real regression. Printed per Verify run,
    * never part of any hashed output. Driver-side collects are ≤ the
    * handful of group rows.
    */
  private[graft] def sketchContractDiag(spark: org.apache.spark.sql.SparkSession,
                                        dir: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_agg(o_custkey, 12)").as("sk"),
        countDistinct(col("o_custkey")).as("exact"))
    val hll = per.select(col("o_orderpriority").as("grp"),
        expr("hll_sketch_estimate(sk)").cast("bigint").as("est"), col("exact"))
      .orderBy("grp").collect()
      .map(r => s"hll grp=${r.getString(0)} est=${r.getLong(1)} exact=${r.getLong(2)}")
    val hAll = per.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk, true))").cast("bigint")
          .as("merged"))
      .crossJoin(broadcast(Tables.orders(spark, dir).agg(
        expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").cast("bigint")
          .as("direct"),
        countDistinct(col("o_custkey")).as("exact"))))
      .head()
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val perK = li.groupBy(col("l_returnflag"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice, 200)").as("sk"))
    val perEst = perK.select(col("l_returnflag").as("grp"),
      expr("kll_sketch_get_quantile_double(sk, 0.5d)").as("est"))
    val allEst = perK.agg(expr(
      "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5d)").as("est_all"))
    val ranks = li.select(col("l_returnflag").as("grp"), col("l_extendedprice"))
      .join(broadcast(perEst), "grp").crossJoin(broadcast(allEst))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("est"), 1L).otherwise(0L)).as("le"),
        sum(when(col("l_extendedprice") <= col("est_all"), 1L).otherwise(0L))
          .as("le_all"),
        first(col("est")).as("est"), first(col("est_all")).as("est_all"))
      .orderBy("grp").collect()
    val kll = ranks.map { r =>
      val n = r.getAs[Long]("n").toDouble
      f"kll grp=${r.getString(0)} est=${r.getAs[Double]("est")}%.2f " +
        f"rank=${r.getAs[Long]("le") / n}%.4f " +
        f"merged_est=${r.getAs[Double]("est_all")}%.2f"
    }
    val nAll = ranks.map(_.getAs[Long]("n")).sum.toDouble
    val leAll = ranks.map(_.getAs[Long]("le_all")).sum
    (hll.toSeq :+
      s"hll ALL merged=${hAll.getLong(0)} direct=${hAll.getLong(1)} exact=${hAll.getLong(2)}") ++
      kll :+ f"kll ALL merged_rank=${leAll / nAll}%.4f"
  }
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1)
    // optional 3rd arg: only run these queries (local dev loop; the
    // driver always calls with 2 args → full registry)
    val only: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(",").toSet) else None
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release this query's cached fragments and localCheckpoint
      // blocks — over the full registry they otherwise accumulate in
      // the storage pool (see the same cleanup in Bench.timeOnce)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // diagnosability for the probabilistic sketch contracts (r10
    // ADVICE): print the raw estimates/ranks behind the hashed
    // booleans so a red gate is attributable
    if (only.forall(s => s("sketch_hll_merge") || s("sketch_kll_merge")))
      try sketchContractDiag(spark, sfDir)
        .foreach(l => System.err.println(s"[verify] $l"))
      catch { case e: Throwable =>
        System.err.println(s"[verify] sketch diag failed: ${e.getMessage}")
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
