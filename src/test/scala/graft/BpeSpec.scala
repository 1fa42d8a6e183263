package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Verifies the distributed BPE merge loop against a single-node
  * reference implementation: same tokenization, same tie-break
  * (count desc, then pair asc), same greedy left-to-right merge —
  * the merge tables must be IDENTICAL row for row.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Classic in-memory BPE on a weighted word-count map. */
  private def referenceBpe(wordCnt: Map[String, Long],
                           nMerges: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[List[String], Long] =
      wordCnt.map { case (w, c) => w.split("").toList -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, a, b, c))
        words = words.groupMapReduce { case (syms, _) =>
          syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        }(_._2)(_ + _)
        r += 1
      }
    }
    out.toSeq
  }

  test("bpe_vocab merge table matches single-node reference BPE exactly") {
    val n = 12
    val got = TextAnalysis.bpeVocab(spark, sf, nMerges = n)
      .select(col("merge_no"), col("left"), col("right"), col("pair_cnt"))
      .as[(Long, String, String, Long)].collect().toSeq

    val wordCnt = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.alphaTokens(lower(col("text")))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val want = referenceBpe(wordCnt, n)

    assert(got.nonEmpty && got.size <= n)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("bpe_vocab merged symbols are concatenations and counts are non-increasing-ish positive") {
    val rows = TextAnalysis.bpeVocab(spark, sf, nMerges = 8)
      .as[(Long, String, String, String, Long)].collect()
    rows.foreach { case (_, l, r, m, c) =>
      assert(m == l + r); assert(c >= 2)
    }
    // merge numbers are 1..n with no gaps
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
  }
}
