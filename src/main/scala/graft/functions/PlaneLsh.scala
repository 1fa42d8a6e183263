package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared md5-derived hyperplane matrices for the LSH similarity
  * family. Coefficient (i, j) hashes the pair index through md5 —
  * every (plane, dim) coefficient is independent (an earlier
  * LCG-style family made every plane a linear offset of every other
  * and cost ~15 recall points; hash-family quality IS recall), fully
  * deterministic, and re-derivable by any engine from the standard
  * digest (the DuckDB oracle rebuilds the same matrix in SQL).
  *
  * Two families:
  *  - "int": coefficients are integers in [-1000001, 1000001]
  *    (first 8 md5 hex chars mod 2000003, centered). Against
  *    ×1024-quantized vectors every plane dot stays < 2⁵³, so the
  *    double that carries it is EXACT integer arithmetic — sign
  *    decisions cannot drift by a last-bit float difference between
  *    engines.
  *  - "float": the same integers rescaled to [-1, 1) — the
  *    convenience family for the non-oracle [[graft.operators.Similarity.annTopK]].
  *
  * Matrices are cached per-JVM: expression instances are serialized
  * per task, and re-deriving 65k md5 digests per task would dwarf the
  * projection work itself.
  */
object PlaneLsh {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, String), Array[Double]]()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Row-major nBits×dim coefficient matrix. */
  def planes(nBits: Int, dim: Int, family: String): Array[Double] =
    cache.computeIfAbsent((nBits, dim, family), { _ =>
      val out = new Array[Double](nBits * dim)
      var i = 0
      while (i < nBits) {
        var j = 0
        while (j < dim) {
          val c = java.lang.Long.parseLong(md5hex(s"$i:$j").substring(0, 8), 16) %
            2000003L - 1000001L
          out(i * dim + j) =
            if (family == "int") c.toDouble else (c + 1000001.0) / 1000001.5 - 1.0
          j += 1
        }
        i += 1
      }
      out
    })

  private def litInt(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"graft_lsh_proj: $what must be an " +
        s"integer literal, got $other")
  }

  private def litStr(e: Expression, what: String): String = e.eval(null) match {
    case null => throw new IllegalArgumentException(
      s"graft_lsh_proj: $what must be a string literal, got NULL")
    case other => other.toString
  }

  /** FunctionRegistry builder: graft_lsh_proj(arr, nBits, dim, family, mode). */
  def buildProj(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 5,
      s"graft_lsh_proj(arr, nBits, dim, family, mode) takes 5 args, got ${exprs.length}")
    PlaneProjections(exprs.head, litInt(exprs(1), "nBits"), litInt(exprs(2), "dim"),
      litStr(exprs(3), "family"), litStr(exprs(4), "mode"))
  }

  /** FunctionRegistry builder: graft_lsh_asym(signWords, projections). */
  def buildAsym(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_lsh_asym(signWords, projections) takes 2 args, got ${exprs.length}")
    LshAsymScore(exprs.head, exprs(1))
  }
}

/** Native Catalyst expression: project a numeric array onto `nBits`
  * md5-derived hyperplanes in ONE tight codegen'd loop.
  *
  * Output per `mode`:
  *  - "proj":  array<double> of the nBits raw projections (the query
  *    side of asymmetric-distance scoring keeps full precision);
  *  - "signs": array<bigint> of ceil(nBits/64) words packing the
  *    projection SIGN bits (bit p of word p/64 = projection p ≥ 0) —
  *    the corpus side stores 128 bytes per vector at nBits=1024, a
  *    16× reduction over the raw 64-float embedding, which is the
  *    point: the ANN scan reads signatures, not vectors.
  *
  * Why an Expression rather than nBits separate zip_with/aggregate
  * columns: 1024 higher-order-function expressions would explode the
  * plan (65k literal leaves), fall out of codegen, and evaluate with
  * per-element lambda dispatch. Here the plane matrix is a single
  * constant reference object and the projection is a JIT-friendly
  * nBits×dim primitive loop — microseconds per vector.
  */
case class PlaneProjections(child: Expression, nBits: Int, dim: Int,
                            family: String, mode: String)
    extends UnaryExpression {

  require(nBits > 0 && dim > 0,
    s"graft_lsh_proj: nBits/dim must be positive, got nBits=$nBits dim=$dim")
  require(family == "int" || family == "float",
    s"graft_lsh_proj: family must be 'int' or 'float', got '$family'")
  require(mode == "proj" || mode == "signs",
    s"graft_lsh_proj: mode must be 'proj' or 'signs', got '$mode'")

  private def nWords: Int = (nBits + 63) / 64

  override def dataType: DataType =
    if (mode == "signs") ArrayType(LongType, containsNull = false)
    else ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType || t == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_proj needs a float/double/bigint array, got " +
            child.dataType.simpleString)
    }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val mat: Array[Double] =
    PlaneLsh.planes(nBits, dim, family)

  /** Malformed input (wrong vector width) fails loudly rather than
    * silently truncating/zero-padding into a plausible-but-wrong
    * signature — a wrong-dim vector in an ANN index is data
    * corruption, not a case to paper over.
    */
  private def badLen(n: Int): Nothing =
    throw new IllegalArgumentException(
      s"graft_lsh_proj: input array has $n elements, expected dim=$dim")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) badLen(a.numElements())
    val t = elemType
    if (mode == "signs") {
      val words = new Array[Long](nWords)
      var p = 0
      while (p < nBits) {
        var s = 0.0; var j = 0; val base = p * dim
        while (j < dim) {
          if (!a.isNullAt(j)) s += mat(base + j) * (t match {
            case FloatType => a.getFloat(j).toDouble
            case LongType  => a.getLong(j).toDouble
            case _         => a.getDouble(j)
          })
          j += 1
        }
        if (s >= 0.0) words(p >> 6) |= 1L << (p & 63)
        p += 1
      }
      new GenericArrayData(words)
    } else {
      val out = new Array[Double](nBits)
      var p = 0
      while (p < nBits) {
        var s = 0.0; var j = 0; val base = p * dim
        while (j < dim) {
          if (!a.isNullAt(j)) s += mat(base + j) * (t match {
            case FloatType => a.getFloat(j).toDouble
            case LongType  => a.getLong(j).toDouble
            case _         => a.getDouble(j)
          })
          j += 1
        }
        out(p) = s
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val matRef = ctx.addReferenceObj("planes", mat, "double[]")
      // every local is freshName'd: these loops fuse into whole-stage
      // codegen methods whose enclosing scope may already declare a
      // plain `p`/`s`/`j` — a collision would fail compilation and
      // silently fall back to interpreted eval
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val getter = elemType match {
        case FloatType => s"(double) $a.getFloat($j)"
        case LongType  => s"(double) $a.getLong($j)"
        case _         => s"$a.getDouble($j)"
      }
      val lenCheck =
        s"""
           |if ($a.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "graft_lsh_proj: input array has " + $a.numElements() +
           |    " elements, expected dim=$dim");
           |}
         """.stripMargin
      if (mode == "signs") {
        val words = ctx.freshName("words")
        s"""
           |$lenCheck
           |long[] $words = new long[$nWords];
           |for (int $p = 0; $p < $nBits; $p++) {
           |  double $s = 0.0; int $base = $p * $dim;
           |  for (int $j = 0; $j < $dim; $j++) {
           |    if (!$a.isNullAt($j)) $s += $matRef[$base + $j] * ($getter);
           |  }
           |  if ($s >= 0.0) $words[$p >> 6] |= 1L << ($p & 63);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
         """.stripMargin
      } else {
        val out = ctx.freshName("out")
        s"""
           |$lenCheck
           |double[] $out = new double[$nBits];
           |for (int $p = 0; $p < $nBits; $p++) {
           |  double $s = 0.0; int $base = $p * $dim;
           |  for (int $j = 0; $j < $dim; $j++) {
           |    if (!$a.isNullAt($j)) $s += $matRef[$base + $j] * ($getter);
           |  }
           |  $out[$p] = $s;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_proj"
}

/** Native Catalyst expression: asymmetric-distance LSH score — the
  * corpus side contributes only projection SIGN bits (packed long
  * words from [[PlaneProjections]] mode="signs"), the query side its
  * full-precision projections: score = Σ_p (±1)_p · qproj_p.
  *
  * Keeping the query side unquantized is the standard asymmetric-
  * hashing refinement: at equal signature width it recovers roughly
  * √2× the effective bits of symmetric Hamming ranking. Measured on
  * the sf0.01 fixture (PLANS.md "asymmetric-hashing ANN" row): a
  * 1024-bit (128-byte) corpus signature with a 24-of-500 shortlist
  * (candidate ratio 0.048) gives recall@5 = 1.00 for the int family
  * and ≥0.8 per query for the float family — vs the retired
  * band-equality LSH whose 12×3-bit banding collided ~80% of the
  * corpus per query.
  *
  * With "int"-family projections over ×1024-quantized vectors every
  * |qproj| ≤ 64·1300·10⁶ and the 1024-term sum stays < 2⁵³, so the
  * score is EXACT integer arithmetic in a double — cross-engine
  * bit-identical, which is what makes the md5 ANN twin
  * oracle-hash-checkable end to end.
  */
case class LshAsymScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Element nulls are rejected at type-check time (rather than
    * guarded per element at runtime): both inputs come from
    * [[PlaneProjections]], whose output types carry
    * containsNull=false, so a nullable-element array here means a
    * wiring mistake — silently skipping nulls would misalign the
    * plane index between sign words and projections.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(DoubleType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_asym needs (array<bigint> sign words, array<double> " +
            s"projections), both with non-nullable elements, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val words = l.asInstanceOf[ArrayData]
    val proj = r.asInstanceOf[ArrayData]
    val n = math.min(words.numElements() * 64, proj.numElements())
    var s = 0.0
    var p = 0
    while (p < n) {
      val sign = (words.getLong(p >> 6) >>> (p & 63)) & 1L
      val q = proj.getDouble(p)
      s += (if (sign == 1L) q else -q)
      p += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, q) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($w.numElements() * 64, $q.numElements());
         |double $s = 0.0;
         |for (int $p = 0; $p < $n; $p++) {
         |  double $v = $q.getDouble($p);
         |  $s += ((($w.getLong($p >> 6) >>> ($p & 63)) & 1L) == 1L) ? $v : -$v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lsh_asym"
}
