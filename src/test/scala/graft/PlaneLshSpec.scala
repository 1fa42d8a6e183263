package graft

import graft.functions.{GraftFunctions, LshAsymScore, PlaneLsh, PlaneProjections}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Eval/codegen parity and semantics for the asymmetric-hashing ANN
  * expressions (graft_lsh_proj / graft_lsh_asym) — the DotProductSpec
  * contract for the LSH family.
  */
class PlaneLshSpec extends SparkSpec {
  import spark.implicits._

  private val nBits = 128
  private val dim = 64

  /** Driver-side reference projection, same accumulation order as the
    * expression (ascending j).
    */
  private def refProj(v: Array[Double], family: String): Array[Double] = {
    val mat = PlaneLsh.planes(nBits, dim, family)
    Array.tabulate(nBits) { p =>
      var s = 0.0; var j = 0
      while (j < dim) { s += mat(p * dim + j) * v(j); j += 1 }
      s
    }
  }

  test("float-family projections (codegen) match the driver-side reference bitwise; " +
    "sign words pack exactly the projection signs") {
    GraftFunctions.register(spark)
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.lshProj(col("embedding"), nBits, dim, "float", "proj").as("proj"),
        GraftFunctions.lshProj(col("embedding"), nBits, dim, "float", "signs").as("sig"))
      .as[(Long, Array[Float], Array[Double], Array[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, emb, proj, sig) =>
      val ref = refProj(emb.map(_.toDouble), "float")
      assert(proj.sameElements(ref)) // exact, not approx
      assert(sig.length == (nBits + 63) / 64)
      (0 until nBits).foreach { p =>
        val bit = (sig(p >> 6) >>> (p & 63)) & 1L
        assert((bit == 1L) == (proj(p) >= 0.0), s"sign bit $p")
      }
    }
  }

  test("int-family projections over ×1024-quantized vectors are exact integers, " +
    "and the SQL-registered asymmetric score equals the driver-side Σ ±qproj") {
    GraftFunctions.register(spark)
    val vq = transform(col("embedding"), x => round(x.cast("double") * 1024).cast("long"))
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), vq.as("vq"))
      .selectExpr("vec_id", "vq",
        s"graft_lsh_proj(vq, $nBits, $dim, 'int', 'proj') AS proj",
        s"graft_lsh_proj(vq, $nBits, $dim, 'int', 'signs') AS sig")
      .selectExpr("vec_id", "vq", "proj", "sig",
        "graft_lsh_asym(sig, proj) AS self_score")
      .as[(Long, Array[Long], Array[Double], Array[Long], Double)].collect()
    rows.foreach { case (_, q, proj, sig, selfScore) =>
      val ref = refProj(q.map(_.toDouble), "int")
      assert(proj.sameElements(ref))
      proj.foreach(x => assert(x == math.rint(x), s"non-integer int-family proj $x"))
      // scoring a signature against its own projections flips every
      // term positive: the score must be Σ |proj_p|, exactly
      assert(selfScore == proj.map(math.abs).sum)
    }
  }

  test("interpreted eval matches codegen output on a literal vector") {
    GraftFunctions.register(spark)
    val v = Array.tabulate(4)(i => (i + 1).toDouble)
    def lit4(mode: String) = PlaneProjections(
      Literal.create(v, ArrayType(DoubleType, containsNull = false)),
      8, 4, "float", mode)
    val interpProj = lit4("proj").eval(null).asInstanceOf[ArrayData].toDoubleArray()
    val interpSig = lit4("signs").eval(null).asInstanceOf[ArrayData].toLongArray()
    val asym = LshAsymScore(
      Literal.create(interpSig, ArrayType(LongType, containsNull = false)),
      Literal.create(interpProj, ArrayType(DoubleType, containsNull = false)))
      .eval(null).asInstanceOf[Double]
    val df = Seq(Tuple1(v)).toDF("v")
      .selectExpr("graft_lsh_proj(v, 8, 4, 'float', 'proj') AS proj",
        "graft_lsh_proj(v, 8, 4, 'float', 'signs') AS sig")
      .selectExpr("proj", "sig", "graft_lsh_asym(sig, proj) AS score")
      .as[(Array[Double], Array[Long], Double)].collect().head
    assert(df._1.sameElements(interpProj))
    assert(df._2.sameElements(interpSig))
    assert(df._3 == asym)
  }

  test("wrong-width input fails loudly instead of silently truncating") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
        .selectExpr("graft_lsh_proj(v, 8, 4, 'float', 'proj')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("expected dim=4")), err.toString)
  }

  test("invalid mode/family/arity are plan-time errors; null input yields null") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_proj(array(1.0D), 8, 1, 'float', 'nonsense')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_proj(array(1.0D), 8, 1, 'gaussian', 'proj')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_lsh_asym(array(1L))").collect()
    }
    val r = spark.sql(
      "SELECT graft_lsh_proj(CAST(NULL AS ARRAY<DOUBLE>), 8, 4, 'float', 'proj')")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("nullable-element arrays are rejected at analysis time by graft_lsh_asym") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql(
        "SELECT graft_lsh_asym(array(CAST(NULL AS BIGINT)), array(1.0D))").collect()
    }
  }

  test("signature build stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = Tables.embeddings(spark, sf)
      .select(GraftFunctions.lshProj(col("embedding"), nBits, dim, "float", "signs").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
