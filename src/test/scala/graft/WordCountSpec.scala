package graft

import graft.functions.TextFns
import graft.operators.WordCount
import org.apache.spark.sql.functions._

/** Mirrors the reference's worker tests
  * (internal/worker/worker_test.go) plus golden counts for its demo
  * inputs (data/input/test{1,2,3}.txt — FIXTURES.md §A).
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def alphaTokens(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(explode(TextFns.alphaTokens(col("text"))).as("w"))
      .as[String].collect().toSeq

  test("alpha tokenize matches reference TestMapFunc") {
    // worker_test.go:7-27
    assert(alphaTokens("hello world hello") == Seq("hello", "world", "hello"))
  }

  test("alpha tokenize strips punctuation (TestMapFunc_SpecialCharacters)") {
    // worker_test.go:29-43
    assert(alphaTokens("hello, world! hello.") == Seq("hello", "world", "hello"))
  }

  test("alpha tokenize drops digits and empties, preserves case") {
    assert(alphaTokens("Ab1cD --2- xyz") == Seq("Ab", "cD", "xyz"))
    assert(alphaTokens("123 456") == Seq.empty)
    assert(alphaTokens("") == Seq.empty)
  }

  test("golden word count over the reference demo inputs") {
    // test1: "Hello world hello", test2: "World map reduce", test3: "New job test"
    val demo = Seq("Hello world hello", "World map reduce", "New job test")
    val got = demo.toDF("text")
      .select(explode(TextFns.alphaTokens(col("text"))).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    val want = Map("Hello" -> 1L, "hello" -> 1L, "world" -> 1L, "World" -> 1L,
      "map" -> 1L, "reduce" -> 1L, "New" -> 1L, "job" -> 1L, "test" -> 1L)
    assert(got == want)
  }

  test("reduce semantics: count == sum of ones (reference TestReduceFunc)") {
    // worker.go:41-44 counts records; hw01 sums values — equal when all 1
    val kv = Seq(("k", 1L), ("k", 1L), ("k", 1L)).toDF("w", "one")
    val byCount = kv.groupBy("w").count().as[(String, Long)].collect().head._2
    val bySum = kv.groupBy("w").agg(sum("one")).as[(String, Long)].collect().head._2
    assert(byCount == 3L && bySum == 3L)
  }

  test("filtered word count keeps only m-q initials and uses 5 range partitions") {
    val out = WordCount.filtered(spark, sf)
    val words = out.select("word").as[String].collect()
    assert(words.nonEmpty)
    assert(words.forall(w => "mnopqMNOPQ".contains(w.head)))
    // WordPartitioner parity (hw02): 5 requested; the range partitioner
    // legitimately merges when there are fewer distinct keys than
    // partitions (4 distinct filtered words at sf0.001)
    assert(out.rdd.getNumPartitions <= 5 && out.rdd.getNumPartitions >= 1)
  }

  test("wordShingles builds n-grams and drops the short tail") {
    val got = Seq("a b c d").toDF("text")
      .select(TextFns.wordShingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect().head
    assert(got == Seq("a b c", "b c d"))
  }
}
