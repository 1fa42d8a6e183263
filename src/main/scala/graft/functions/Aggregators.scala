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
}
