package graft

import graft.operators.Models
import org.apache.spark.sql.functions._

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen recovers a known spectrum, orthonormal, A·v = λ·v") {
    // A = [[2,1],[1,2]] has eigvals 3,1 with eigvecs (1,1)/√2, (1,−1)/√2
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (eig, vecs) = Models.jacobiEigen(a)
    assert(math.abs(eig(0) - 3.0) < 1e-12 && math.abs(eig(1) - 1.0) < 1e-12)
    for (i <- 0 until 2; j <- 0 until 2) {
      val dot = (0 until 2).map(r => vecs(i)(r) * vecs(j)(r)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-12)
    }
    for (i <- 0 until 2; r <- 0 until 2) {
      val av = (0 until 2).map(c => a(r)(c) * vecs(i)(c)).sum
      assert(math.abs(av - eig(i) * vecs(i)(r)) < 1e-10, s"A·v ≠ λ·v at $i,$r")
    }
  }

  test("jacobiEigen on a rotated diagonal: eigvals sorted desc, trace preserved") {
    // build A = R·diag(5,2,−1)·Rᵀ with a fixed rotation in the (0,2) plane
    val d = Array(5.0, 2.0, -1.0)
    val th = 0.7
    val r = Array(
      Array(math.cos(th), 0.0, -math.sin(th)),
      Array(0.0, 1.0, 0.0),
      Array(math.sin(th), 0.0, math.cos(th)))
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (eig, _) = Models.jacobiEigen(a)
    assert(eig.zip(Seq(5.0, 2.0, -1.0)).forall { case (g, w) => math.abs(g - w) < 1e-10 })
    assert(math.abs(eig.sum - (a(0)(0) + a(1)(1) + a(2)(2))) < 1e-10)
  }

  test("emb_pca: every contract row ok, moment sums match an independent recompute") {
    val full = Models.embPca(spark, sf).as[(String, Long, Boolean)].collect()
    assert(full.nonEmpty && full.forall(_._3), s"failed contracts: ${full.filterNot(_._3).mkString(",")}")
    val vals = full.map(r => r._1 -> r._2).toMap
    assert(vals("dim") == 64 && vals("k_components") == 8)
    // independent recompute of the exact-integer moment sums via a
    // pure SQL aggregation (no mapPartitions) — pins the Gram path
    val s = Tables.embeddings(spark, sf)
      .select(explode(transform(col("embedding"),
        x => round(x.cast("double") * 1024).cast("long"))).as("x"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .head()
    assert(s.getLong(0) == vals("sum_total"), s"sum_total ${s.getLong(0)}")
    assert(s.getLong(1) == vals("sumsq_total"), s"sumsq_total ${s.getLong(1)}")
  }

  test("trainSoftmax drives a cleanly separable 3-class toy set to zero error") {
    // 3 clusters at distinct corners, deterministic jitter; bias + 2 features
    val pts = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val (cx, cy) = c match {
        case 0 => (10.0, 0.0)
        case 1 => (0.0, 10.0)
        case _ => (-10.0, -10.0)
      }
      (c, Array(1.0, cx + (i % 7) * 0.1, cy + (i % 5) * 0.1))
    }
    val feat = spark.createDataset(pts)
    val (w, n, acc, loss) = Models.trainSoftmax(spark, feat, 3, 3, 60, 1.0)
    assert(n == 90)
    assert(acc >= 0.99, s"toy accuracy $acc")
    assert(loss < 0.2, s"toy loss $loss")
    assert(w.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("quantize1024 JVM form == the round(x*1024) column expression (full fixture)") {
    val viaExpr = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1024).cast("long")).as("vq"))
      .as[(Long, Array[Long])].collect().toMap
    val viaJvm = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    assert(viaJvm.nonEmpty)
    viaJvm.foreach { case (id, emb) =>
      assert(Models.quantize1024(emb).sameElements(viaExpr(id)), s"vec $id")
    }
    // the exact-half edge both forms must round AWAY from zero
    // (2.5/1024 = 5·2^-11, exactly representable as a float)
    assert(Models.quantize1024(Array(2.5f / 1024)).sameElements(Array(3L)))
    assert(Models.quantize1024(Array(-2.5f / 1024)).sameElements(Array(-3L)))
  }

  test("domain_classifier: every contract row ok, label counts exact") {
    val full = Models.domainClassifier(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(full.nonEmpty && full.forall(_._3), s"failed contracts: ${full.filterNot(_._3).mkString(",")}")
    val vals = full.map(r => r._1 -> r._2).toMap
    val want = Tables.embeddings(spark, sf).groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    want.foreach { case (l, c) =>
      assert(vals(s"n_label_$l") == c, s"label $l count")
    }
    assert(vals("n_vectors") == want.values.sum)
  }
}
