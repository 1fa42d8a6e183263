package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** A/B harness for the r11 two-level centroid routing in the trained
  * near-dup blocking ([[graft.operators.Similarity]] cellAssignments).
  *
  * [[ScaleUp]] replicas copy embedding CONTENT, so the number of
  * DISTINCT vectors — the n_u that sizes the adaptive ⌈√n_u⌉ codebook
  * and the flat-assignment n_u·√n_u dot-product bill — never grows
  * with N there. This tool builds the corpus that actually stresses
  * the assignment: N replicas of the embeddings table with replica i's
  * first component shifted by i/1024 (an exact power-of-two float
  * step, so after the ×1024 integer quantization every replica is a
  * distinct vector by construction), then times the full blocking
  * assignment with the shipping router (routeAt=16) against the flat
  * scorer (routeAt=MaxValue forces k2=1, which degenerates the SAME
  * pipeline to exhaustive scoring — identical plan shape, so the
  * comparison isolates the routing arithmetic).
  *
  * Usage: runMain graft.tools.RouteProbe <inSfDir> <workDir> <n> [both|routed|flat]
  * (variant selector: at 100× the flat baseline is half an hour per
  * run — the point the router exists to avoid — so the sweep can run
  * routed-only there and keep flat for the 10× A/B.)
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RouteProbe <inSfDir> <workDir> <n> [both|routed|flat]")
    val in = args(0); val work = args(1); val n = args(2).toInt
    val variant = if (args.length > 3) args(3) else "both"
    val spark = Sessions.local("graft-routeprobe")

    val emb = Tables.embeddings(spark, in)
    val vk = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val reps = spark.range(n).toDF("__rep")
    emb.crossJoin(broadcast(reps))
      .select((col("vec_id") + col("__rep") * vk).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("__rep").cast("float") / lit(1024.0f))
            .otherwise(x)).as("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/embeddings.parquet")

    def time(label: String, routeAt: Int): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = graft.operators.Similarity
          .blockingCells(spark, work, routeAt = routeAt).count()
        println(f"PROBE $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    if (variant != "routed") time(s"assign_flat[n=${n}x]", Int.MaxValue)
    if (variant != "flat") time(s"assign_routed[n=${n}x]", 16)
    spark.stop()
  }
}
