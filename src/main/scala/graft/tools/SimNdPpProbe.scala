package graft.tools

import graft.Sessions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measures the r17-verdict-#7 lever for `sim_neardup`: replacing the
  * probes×probes candidate join of
  * [[graft.operators.Similarity.cellVerified]] with a probes×PRIMARY
  * join — each pair is then a candidate only where one side's probe
  * list covers the other's top-1 cell, removing the ~3.6× duplication
  * of pairs that share several probed cells. The lever is admissible
  * only if the drop-set recall contract (≥ 0.9 at the deliberately-low
  * 0.3 bar) holds; r15 measured 0.897 with 2 super-probes, i.e. the
  * contract has no slack — this probe re-measures with the shipping
  * 3-super-probe routing at each SF.
  *
  * Printed per corpus:
  *   - n_u (distinct reps), true pairs ≥ minSim (brute force);
  *   - candidate volumes: probes×probes vs probes×primary (the
  *     duplication factor the lever removes);
  *   - pair recall and rep-level DROP recall (a rep is droppable iff
  *     it has a lower-id true neighbor; the forest preserves drops, so
  *     this is the contract the spec pins) for BOTH variants;
  *   - wall-clock of each variant's verified-pair count (runs 1-3;
  *     read run 2+).
  *
  * Usage: runMain graft.tools.SimNdPpProbe <sfDir> [minSim]
  */
object SimNdPpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val minSim = if (args.length > 1) args(1).toDouble else 0.3
    val spark = Sessions.local("graft-simnd-pp")
    graft.functions.GraftFunctions.register(spark)
    val ndot = graft.functions.GraftFunctions.dot _
    val (groups, _) = Similarity.exactGroups(spark, dir)
    val emb = groups
      .select(col("rep").as("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .localCheckpoint()
    val nU = emb.count()
    // ground truth: brute-force all-pairs over the distinct reps
    val truth = emb.select(col("vec_id").as("a"), col("v").as("va"),
        col("nrm").as("na"))
      .join(broadcast(emb.select(col("vec_id").as("b"), col("v").as("vb"),
        col("nrm").as("nb"))), col("a") < col("b"))
      .select(col("a"), col("b"),
        (ndot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b")).localCheckpoint()
    val nTrue = truth.count()
    println(s"PP $dir n_u=$nU true_pairs=$nTrue (minSim=$minSim)")

    // the two candidate joins over the SAME deterministic assignments
    def asg(nProbe: Int) =
      Similarity.cellAssignments(spark, groups, 0, nProbe)
    def side(a: org.apache.spark.sql.DataFrame, tag: String) =
      a.select(col("cell"), col("vec_id").as(s"${tag}id"),
        col("v").as(s"${tag}v"), col("nrm").as(s"${tag}n"))
    def verified(left: org.apache.spark.sql.DataFrame,
                 right: org.apache.spark.sql.DataFrame,
                 strict: Boolean) = {
      val j = side(left, "a").join(side(right, "b"), "cell")
      val f = if (strict) j.filter(col("aid") < col("bid"))
        else j.filter(col("aid") =!= col("bid"))
      f.select(least(col("aid"), col("bid")).as("a"),
          greatest(col("aid"), col("bid")).as("b"),
          (ndot(col("av"), col("bv")) / (col("an") * col("bn"))).as("sim"))
        .filter(col("sim") >= minSim)
        .select(col("a"), col("b")).distinct()
    }
    def stats(name: String, pairs: org.apache.spark.sql.DataFrame,
              candCount: => Long): Unit = {
      var found: org.apache.spark.sql.DataFrame = null
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        found = pairs.localCheckpoint()
        val n = found.count()
        println(f"PP $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"pairs=$n")
      }
      val hit = found.join(truth, Seq("a", "b"), "inner").count()
      val pairRecall = if (nTrue == 0) 1.0 else hit.toDouble / nTrue
      // drop-set recall: droppable reps = greater endpoints of truth
      val truthDrops = truth.select(col("b").as("d")).distinct()
      val nDrops = truthDrops.count()
      val gotDrops = found.join(truth, Seq("a", "b"), "inner")
        .select(col("b").as("d")).distinct()
      val dHit = gotDrops.join(truthDrops, "d").count()
      val dropRecall = if (nDrops == 0) 1.0 else dHit.toDouble / nDrops
      println(f"PP $name: candidates=$candCount pair_recall=$pairRecall%.4f " +
        f"drop_recall=$dropRecall%.4f (true_drops=$nDrops)")
    }
    val all = asg(4)
    val prim = asg(1)
    stats("probesxprobes", verified(all, all, strict = true),
      side(all, "a").join(side(all, "b"), "cell")
        .filter(col("aid") < col("bid")).count())
    stats("probesxprimary", verified(all, prim, strict = false),
      side(all, "a").join(side(prim, "b"), "cell")
        .filter(col("aid") =!= col("bid")).count())
    spark.stop()
  }
}
