package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator demos — the UDAF surface the reference's
  * user-supplied ReduceFunc represents (internal/worker/worker.go:41:
  * `func(key string, values []string) string`). Spark's Aggregator
  * gives the same pluggable-reduce contract but with merge (partial
  * aggregation) — equivalent to the reference's combiner variants
  * (legacy/.../hw02/WordCountSiCombiner.java:81) done properly.
  */
object Aggregators {

  /** Geometric mean via sum-of-logs: reduce/merge are associative +
    * commutative, so Spark runs it partial→final (map-side combine).
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1L)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Misra–Gries heavy-hitter summary as a MERGEABLE typed
    * Aggregator (the Agarwal et al. "Mergeable Summaries" variant):
    * the buffer holds at most `k` (item → counter) entries; inserting
    * into a full buffer, or merging two buffers past `k` entries,
    * subtracts the (k+1)-th largest counter from every entry and
    * drops the non-positive ones. The classic guarantee survives
    * merging in any order/partitioning: every item with true
    * frequency > n/k is present in the final buffer (counters
    * underestimate by at most n/k). That makes it a sketch-shaped
    * partial aggregate: each input partition reduces to ≤ k entries
    * map-side and Spark merges the tiny buffers at the exchange —
    * the full distinct-key set never shuffles, which is the whole
    * point at a 100 TB corpus whose key cardinality exceeds memory.
    *
    * finish() emits the CANDIDATE items only; callers re-scan to
    * exact-count just those candidates (see TextAnalysis
    * .heavyHitters) so the served output is exact, not approximate.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty

    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // (k+1)-th largest counter; subtract it everywhere
        val kth = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        m.iterator.collect { case (w, c) if c > kth => (w, c - kth) }.toMap
      }

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      shrink(b.updated(x, b.getOrElse(x, 0L) + 1L))

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val (small, big) = if (a.size < b.size) (a, b) else (b, a)
      shrink(small.foldLeft(big) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      })
    }

    override def finish(b: Map[String, Long]): Seq[String] =
      b.keysIterator.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
