package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: band the unbanded Levenshtein filter.
  *
  * A user writing `WHERE levenshtein(a, b) <= k` pays the full O(n·m) DP
  * on EVERY row — including the overwhelming majority that are nowhere
  * near distance k. But Spark already ships the banded O(k·n) kernel
  * (`levenshtein(a, b, k)` returns the exact distance when ≤ k and −1
  * past the band), and
  *
  *   levenshtein(a, b) <= k  ⟺  levenshtein(a, b, k) >= 0
  *
  * for every non-negative literal k (NULL inputs yield NULL on both
  * sides — same filter behavior). This rule rewrites each such filter
  * conjunct to the banded form AND prepends the free length lower bound
  * `abs(length(a) − length(b)) <= k` (edit distance can never beat the
  * length difference), so far pairs fail on two integer ops before any
  * DP runs — the exact discipline C97's operator applies by hand
  * (Sketch.editDistancePairsOn), encoded once for every SQL user.
  *
  * Idempotent by construction: the rewritten conjunct carries a banded
  * Levenshtein (threshold = Some), which the pattern no longer matches —
  * no marker tags, no fixpoint churn. Scope is deliberately tight:
  * foldable k, evaluated ≥ 0 at rewrite time (a negative k makes the
  * original predicate constant-false for non-null inputs; not worth
  * special-casing), `<=`/`>=` spellings in both operand orders.
  */
object BandedLevenshteinRewrite extends Rule[LogicalPlan]
    with PredicateHelper {

  private def kValue(k: Expression): Option[Int] =
    if (k.foldable && k.dataType ==
        org.apache.spark.sql.types.IntegerType) {
      k.eval() match {
        case i: java.lang.Integer if i >= 0 => Some(i)
        case _ => None
      }
    } else None

  private def rewrite(lev: Levenshtein, k: Expression): Expression = {
    val guard = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right))), k)
    val banded = GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(k)), Literal(0))
    And(guard, banded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      var changed = false
      val newCond = splitConjunctivePredicates(cond).map {
        case LessThanOrEqual(lev: Levenshtein, k)
            if lev.threshold.isEmpty && kValue(k).isDefined =>
          changed = true; rewrite(lev, k)
        case GreaterThanOrEqual(k, lev: Levenshtein)
            if lev.threshold.isEmpty && kValue(k).isDefined =>
          changed = true; rewrite(lev, k)
        case other => other
      }.reduce(And)
      if (changed) f.copy(condition = newCond) else f
  }
}
