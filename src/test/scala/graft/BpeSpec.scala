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

  /** Classic in-memory BPE on a weighted word-count map; returns the
    * merge table AND the final word → symbols tokenization.
    */
  private def referenceBpe(wordCnt: Map[String, Long], nMerges: Int)
      : (Seq[(Long, String, String, Long)], Map[String, List[String]]) = {
    var words: Map[String, (List[String], Long)] =
      wordCnt.map { case (w, c) => w -> (w.split("").toList, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, a, b, c))
        words = words.map { case (w, (syms, c)) =>
          w -> (syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }, c)
        }
        r += 1
      }
    }
    (out.toSeq, words.map { case (w, (syms, _)) => w -> syms })
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
    val want = referenceBpe(wordCnt, n)._1

    assert(got.nonEmpty && got.size <= n)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("bpe_encode token counts match reference tokenization per doc") {
    val n = 12
    val got = TextAnalysis.bpeEncode(spark, sf, nMerges = n)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")))
      .as[(Long, String)].collect()
    val toWords = (t: String) => t.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val wordCnt = docs.flatMap(d => toWords(d._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val enc = referenceBpe(wordCnt, n)._2
    docs.foreach { case (id, text) =>
      val ws = toWords(text)
      if (ws.nonEmpty) {
        val (nw, nt) = got(id)
        assert(nw == ws.length, s"doc $id word count")
        assert(nt == ws.map(w => enc(w).length.toLong).sum, s"doc $id token count")
      } else assert(!got.contains(id))
    }
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
