package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Scratch A/B probe for optimization experiments: times variants of
  * a query shape and asserts result equality against the shipping
  * form. Diagnostic only — never part of any gate.
  * Usage: runMain graft.tools.TuneProbe <sfDir> <experiment>
  */
object TuneProbe {
  def timed(label: String)(f: => Long): Unit = {
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"TUNE $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
  }

  def sameAs(a: DataFrame, b: DataFrame): Unit = {
    val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
    println(s"TUNE equal: ${d1 == 0 && d2 == 0} (a-b=$d1 b-a=$d2)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val exp = args(1)
    val spark = Sessions.local("graft-tune")
    exp match {
      case "profile_stats" =>
        val ship = () => graft.operators.Relational.profileStats(spark, dir)
        timed("shipping")(ship().count())
        // variant: three separate 2-phase distinct counts, one scan each
        val li = Tables.lineitem(spark, dir)
        def v1(): DataFrame = {
          val base = li.agg(
            count(lit(1)).as("n"),
            count(col("l_quantity")).as("nn_q"),
            min(col("l_quantity")).cast("string").as("mn_q"),
            max(col("l_quantity")).cast("string").as("mx_q"),
            count(col("l_returnflag")).as("nn_r"),
            min(col("l_returnflag")).as("mn_r"),
            max(col("l_returnflag")).as("mx_r"),
            count(col("l_shipdate")).as("nn_s"),
            min(col("l_shipdate")).cast("string").as("mn_s"),
            max(col("l_shipdate")).cast("string").as("mx_s"))
          val ndq = li.select(col("l_quantity")).distinct()
            .agg(count(lit(1)).as("nd_q"))
          val ndr = li.select(col("l_returnflag")).distinct()
            .agg(count(lit(1)).as("nd_r"))
          val nds = li.select(col("l_shipdate")).distinct()
            .agg(count(lit(1)).as("nd_s"))
          base.crossJoin(ndq).crossJoin(ndr).crossJoin(nds)
            .selectExpr(
              """stack(3,
                |  'l_quantity',   n, n - nn_q, nd_q, mn_q, mx_q,
                |  'l_returnflag', n, n - nn_r, nd_r, mn_r, mx_r,
                |  'l_shipdate',   n, n - nn_s, nd_s, mn_s, mx_s)
                |AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)""".stripMargin)
            .orderBy("col_name")
        }
        timed("split-distinct")(v1().count())
        sameAs(ship(), v1())
      case "sketch_cms" =>
        val d = 4; val w = 256; val topK = 10
        def bucket(j: Int, c: org.apache.spark.sql.Column) =
          conv(substring(md5(concat_ws(":",
            lit(j).cast("string"), c.cast("string"))), 1, 12), 16, 10)
            .cast("long") % w
        def buckets(c: org.apache.spark.sql.Column) = explode(array(
          (0 until d).map(j =>
            struct(lit(j).as("j"), bucket(j, c).as("bucket"))): _*)).as("jb")
        timed("shipping")(
          graft.operators.Relational.cmsTopK(spark, dir).count())
        def v1(): DataFrame = {
          val li = Tables.lineitem(spark, dir).select(col("l_suppkey").as("k"))
          val keyCnt = li.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
          val sketch = keyCnt.select(col("exact_cnt"), buckets(col("k")))
            .select(col("jb.j"), col("jb.bucket"), col("exact_cnt"))
            .groupBy("j", "bucket").agg(sum(col("exact_cnt")).as("cnt"))
          val topk = keyCnt
            .orderBy(col("exact_cnt").desc, col("k")).limit(topK)
          val est = topk.select(col("k"), buckets(col("k")))
            .select(col("k"), col("jb.j"), col("jb.bucket"))
            .join(sketch, Seq("j", "bucket"))
            .groupBy("k").agg(min(col("cnt")).as("est_cnt"))
          topk.join(est, "k")
            .crossJoin(broadcast(
              keyCnt.agg(sum(col("exact_cnt")).as("n_total"))))
            .select(
              col("k").as("suppkey"), col("exact_cnt"), col("est_cnt"),
              (col("est_cnt") >= col("exact_cnt")).as("never_under"),
              (col("est_cnt") - col("exact_cnt") <=
                lit(8) * col("n_total") / lit(w)).as("bound_ok"))
            .orderBy(col("exact_cnt").desc, col("suppkey"))
        }
        timed("key-first")(v1().count())
        sameAs(graft.operators.Relational.cmsTopK(spark, dir), v1())
      case "simnd" =>
        def run(label: String): Unit = {
          timed(label)(
            graft.operators.Similarity.embeddingNearDup(spark, dir).count())
        }
        run("shipping")
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        run("min64k")
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", "false")
        run("nocoalesce")
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      case _ => sys.error(s"unknown experiment $exp")
    }
    spark.stop()
  }
}
