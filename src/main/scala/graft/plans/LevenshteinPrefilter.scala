package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule for fuzzy-match predicates: rewrites
  * `levenshtein(a, b) <= k` (k a non-negative literal) inside Filter
  * and Join conditions into
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Two independent wins, both semantics-preserving:
  *
  *  1. The length guard is O(1) and, by the Levenshtein lower bound
  *     `lev(a,b) >= |len(a) - len(b)|`, discards most non-matches in
  *     a fuzzy join before any edit-distance work — the standard
  *     length-blocking trick, applied automatically by the optimizer
  *     instead of by every query author.
  *  2. The surviving pairs run Spark's THRESHOLDED Levenshtein
  *     (`levenshtein(a, b, k)` returns -1 when the distance exceeds
  *     k), which uses the banded O(k·min(n,m)) dynamic program and
  *     abandons early, instead of the full O(n·m) table. For k=2 over
  *     25-char names that is ~5 diagonal cells per row instead of 25.
  *
  * Equivalence: for k >= 0, `lev(a,b) <= k  ⇔  lev(a,b,k) >= 0`
  * (null inputs stay null through both forms, and a null/false
  * condition drops the row identically in Filter/Join, which is why
  * the rewrite is restricted to those nodes and never applied to
  * projected expressions, where `And` could turn null into false).
  *
  * Idempotent by construction: the rewritten tree contains no bare
  * two-argument Levenshtein comparison, so the fixed-point optimizer
  * batch can re-run the rule safely. Registered via
  * [[graft.functions.GraftExtensions]] (injectOptimizerRule).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** Matches an un-thresholded levenshtein, possibly under the cast
    * the DataFrame API inserts (`.cast("long")`).
    */
  private object LevOf {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case lev @ Levenshtein(_, _, None) => Some(lev)
      case Cast(lev @ Levenshtein(_, _, None), LongType, _, _) => Some(lev)
      case _ => None
    }
  }

  /** Int/long literal as a non-negative Int. */
  private object KLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
      case Literal(v: Long, LongType) if v >= 0 && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }
  }

  private def bounded(lev: Levenshtein, k: Int): Expression = {
    val guard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), Literal(k))
    val thresholded = GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))
    And(guard, thresholded)
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // lev(a,b) <= k  and the flipped  k >= lev(a,b)
    case LessThanOrEqual(LevOf(lev), KLit(k)) => bounded(lev, k)
    case GreaterThanOrEqual(KLit(k), LevOf(lev)) => bounded(lev, k)
    // strict forms: lev(a,b) < k  ⇔  lev(a,b) <= k-1  (k >= 1)
    case LessThan(LevOf(lev), KLit(k)) if k >= 1 => bounded(lev, k - 1)
    case GreaterThan(KLit(k), LevOf(lev)) if k >= 1 => bounded(lev, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _) =>
      j.copy(condition = Some(rewrite(cond)))
  }
}
