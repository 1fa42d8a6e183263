package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the combiner-correctness and tokenizer laws the
  * reference's hw02 variants exercise by construction. Uses plain
  * ScalaCheck generators with fixed seeds (no scalatestplus bridge —
  * offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.listOfN(40,
    Gen.oneOf("map", "reduce", "Spark", "shuffle", "key", "q", "M1x", "a.b", "", "7"))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("tokenize-then-count equals brute-force count (random inputs)") {
    samples(wordGen, 10).foreach { words =>
      val text = words.mkString(" ")
      val got = Seq(text).toDF("text")
        .select(explode(TextFns.alphaTokens(col("text"))).as("w"))
        .groupBy("w").count().as[(String, Long)].collect().toMap
      val want = "[a-zA-Z]+".r.findAllIn(text).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"for input: $text")
    }
  }

  test("partial+final sum invariant under any repartitioning") {
    val base = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity")
    val direct = base.groupBy("l_returnflag").agg(sum("l_quantity"))
      .as[(String, Double)].collect().toMap
    Seq(1, 3, 17).foreach { n =>
      val re = base.repartition(n).groupBy("l_returnflag").agg(sum("l_quantity"))
        .as[(String, Double)].collect().toMap
      direct.foreach { case (k, v) =>
        assert(math.abs(re(k) - v) < 1e-6 * math.abs(v).max(1.0))
      }
    }
  }

  test("dedup idempotence: dropDuplicates twice == once") {
    val docs = Tables.documents(spark, sf)
    val once = docs.dropDuplicates("text")
    assert(once.count() == once.dropDuplicates("text").count())
  }

  test("rolling hash matches a plain-Scala reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().take(20)
    val got = graft.operators.TextAnalysis.rollingHash(spark, sf)
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, t) => assert(got(id) == ref(t), s"doc $id") }
  }

  test("fingerprint is whitespace/case-normalization invariant") {
    val df = Seq("Hello  World", "hello world", " HELLO WORLD ").toDF("text")
      .select(TextFns.fingerprint(col("text")).as("fp"))
      .as[String].collect()
    assert(df.distinct.length == 1)
  }

  test("gopher rules: keep is exactly the conjunction; signals in range") {
    val rows = graft.operators.TextAnalysis.gopherRules(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val flags = Seq("ok_words", "ok_mwl", "ok_alpha", "ok_symbol", "ok_stop")
        .map(f => r.getAs[Boolean](f))
      assert(r.getAs[Boolean]("keep") == flags.forall(identity))
      assert(r.getAs[Long]("n_words") > 0)
      val af = r.getAs[Double]("alpha_frac")
      assert(af >= 0.0 && af <= 1.0)
      assert(r.getAs[Double]("mean_word_len") > 0.0)
      assert(r.getAs[Double]("symbol_ratio") >= 0.0)
    }
    // the fixture is clean prose: the content rules must pass broadly
    // (word-count band is the only rule expected to reject docs here)
    val nOkAlpha = rows.count(_.getAs[Boolean]("ok_alpha"))
    assert(nOkAlpha.toDouble / rows.length >= 0.95)
  }
}
