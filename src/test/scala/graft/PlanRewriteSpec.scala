package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The injected optimizer rule (LevenshteinPrefilter) must engage on
  * fuzzy predicates and must never change results.
  */
class PlanRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy filter is rewritten to length guard + thresholded DP") {
    val plan = TextAnalysis.fuzzyNameMatch(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the guard and the 3-arg (banded) levenshtein replace the bare
    // 2-arg comparison in the filter condition
    assert(plan.contains("abs((length("), plan)
    assert("levenshtein\\([^)]*Some\\(2\\)\\) >= 0".r.findFirstIn(plan).isDefined, plan)
  }

  test("rewrite preserves results, including nulls and boundary distances") {
    val df = Seq[(String, String)](
      ("kitten", "sitting"),   // dist 3
      ("kitten", "kitten"),    // dist 0
      ("kitten", "mitten"),    // dist 1
      ("abc", "abcd"),         // dist 1
      ("abc", "xyzabc"),       // dist 3 (length guard prunes at k<=2)
      ("abc", null),           // null comparison drops
      (null, "abc")
    ).toDF("a", "b")
    def got(k: Int) = df.filter(levenshtein(col("a"), col("b")) <= k)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got(0) == Set(("kitten", "kitten")))
    assert(got(1) == Set(("kitten", "kitten"), ("kitten", "mitten"), ("abc", "abcd")))
    assert(got(3) == Set(("kitten", "sitting"), ("kitten", "kitten"),
      ("kitten", "mitten"), ("abc", "abcd"), ("abc", "xyzabc")))
    // strict form goes through the k-1 rewrite
    val strict = df.filter(levenshtein(col("a"), col("b")) < 2)
      .select("a").collect().length
    assert(strict == 3)
  }

  test("rewrite applies inside join conditions") {
    val l = Seq("alpha", "beta").toDF("x")
    val r = Seq("alphb", "gamma").toDF("y")
    val j = l.join(r, levenshtein(col("x"), col("y")) <= 1)
    assert(j.queryExecution.optimizedPlan.toString.contains("abs((length("))
    assert(j.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("alpha", "alphb")))
  }
}
