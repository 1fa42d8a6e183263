package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a long key against
  * a pre-built Bloom filter — the scan-side half of a bloom-prefiltered
  * join (the same shape Spark's runtime row-level filtering injects
  * when `spark.sql.optimizer.runtime.bloomFilter.enabled` fires, but
  * available as an explicit, plannable operator so a pipeline can
  * build the filter once and reuse it across many scans).
  *
  * The serialized filter travels with the expression (closured into
  * the task binary once, NOT per row); deserialization happens lazily
  * once per expression instance, and codegen pins the deserialized
  * filter as a reference object — the generated per-row code is a
  * single virtual call on a long, no boxing.
  *
  * False positives are by design: a bloom prefilter must always be
  * followed by the exact join, which removes them. Used that way the
  * composed result is EXACTLY the plain join's (oracle-checkable),
  * while the shuffle only carries rows that might match.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_might_contain needs a BIGINT key, got ${other.simpleString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(filterBytes)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomMightContain {
  /** Column-level probe against a pre-built filter. */
  def probe(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    org.apache.spark.sql.GraftSqlShims.column(
      BloomMightContain(
        org.apache.spark.sql.GraftSqlShims.expression(key), bos.toByteArray))
  }
}
