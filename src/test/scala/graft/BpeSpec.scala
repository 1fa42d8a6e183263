package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Verifies the distributed BPE trainer against single-node reference
  * implementations, pinning BOTH of its contracts:
  *  - batchSize = 1 must be CLASSIC sequential BPE (same tokenization,
  *    same (count desc, pair asc) tie-break, same greedy left-to-right
  *    merge) — merge tables identical row for row;
  *  - the default batched mode must equal a single-node reference of
  *    the SAME batched selection rule (top-m pairwise-independent
  *    pairs per counting round, skip on symbol/merged-string overlap,
  *    applied simultaneously) — identical row for row.
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

  /** Batched in-memory BPE — the r11 variant the operator ships:
    * each round ranks pairs once, selects up to batchSize pairwise-
    * independent pairs (a, b, a+b disjoint from every earlier
    * selection's symbols; a, b not created by an earlier selection),
    * and applies them in one greedy left-to-right pass.
    */
  private def referenceBpeBatched(wordCnt: Map[String, Long], nMerges: Int,
                                  batchSize: Int)
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
      // the selection WINDOW is part of the rule: only the top
      // 4·want+8 ranked pairs are candidates (the distributed
      // trainer collects exactly that bounded prefix driver-side)
      val want = math.min(nMerges - r + 1, batchSize)
      val ranked = counts.toSeq.filter(_._2 >= 2)
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .take(4 * want + 8)
      if (ranked.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val made = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
        ranked.iterator.takeWhile(_ => batch.length < want).foreach {
          case ((a, b), c) =>
            val m = a + b
            if (batch.length < want &&
                !used(a) && !used(b) && !used(m) && !made(a) && !made(b)) {
              batch += (((a, b), c)); used += a; used += b; made += m
            }
        }
        val pairMap = batch.map { case ((a, b), _) => (a, b) -> (a + b) }.toMap
        batch.foreach { case ((a, b), c) => out += ((r.toLong, a, b, c)); r += 1 }
        words = words.map { case (w, (syms, c)) =>
          w -> (syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && pairMap.contains((acc.last, x)))
              acc.init :+ pairMap((acc.last, x))
            else acc :+ x
          }, c)
        }
      }
    }
    (out.toSeq, words.map { case (w, (syms, _)) => w -> syms })
  }

  private def wordCounts: Map[String, Long] =
    graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.alphaTokens(lower(col("text")))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap

  test("bpe_vocab with batchSize=1 matches classic single-node BPE exactly") {
    val n = 12
    val got = TextAnalysis.bpeVocab(spark, sf, nMerges = n, batchSize = 1)
      .select(col("merge_no"), col("left"), col("right"), col("pair_cnt"))
      .as[(Long, String, String, Long)].collect().toSeq
    val want = referenceBpe(wordCounts, n)._1
    assert(got.nonEmpty && got.size <= n)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("bpe_vocab default batch matches the batched single-node reference exactly") {
    val n = 12
    val got = TextAnalysis.bpeVocab(spark, sf, nMerges = n)
      .select(col("merge_no"), col("left"), col("right"), col("pair_cnt"))
      .as[(Long, String, String, Long)].collect().toSeq
    val want = referenceBpeBatched(wordCounts, n, batchSize = 8)._1
    assert(got.nonEmpty && got.size <= n)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("bpe_encode token counts match batched reference tokenization per doc") {
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
    val enc = referenceBpeBatched(wordCnt, n, batchSize = 8)._2
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
