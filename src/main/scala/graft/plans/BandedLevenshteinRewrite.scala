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
  * Levenshtein (threshold = Some), which the patterns no longer match —
  * no marker tags, no fixpoint churn. Scope: foldable INT k, evaluated
  * at rewrite time (a negative k makes the original predicate constant
  * for non-null inputs; not worth special-casing), and every comparison
  * spelling in both operand orders (r11 next-round #6):
  *
  *  - `lev <= k` / `lev < k`  → length guard AND banded(k) ≥ 0
  *    (strict < bands at k−1: lev < k ⟺ lev ≤ k−1, needs k ≥ 1);
  *  - `lev = k`               → length guard AND banded(k) = k
  *    (the band returns the EXACT distance when ≤ k);
  *  - `lev >= k` / `lev > k`  → length-gap OR banded(k') < 0 with
  *    k' = k−1 / k (−1 past the band ⟺ distance beyond it; the Or
  *    short-circuits per row, so far pairs decide on the length gap
  *    alone) — this is the other half of `BETWEEN lo AND hi`, which
  *    Catalyst desugars into the two conjuncts, so BETWEEN now bands
  *    end to end.
  *
  * NULL behavior is identical in every case: a NULL operand nulls both
  * the original predicate and every rewritten guard/probe.
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

  private def unbanded(lev: Levenshtein): Boolean = lev.threshold.isEmpty

  private def lengthGap(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))

  /** `lev(a,b) <= i`: the free length lower bound, then the banded probe. */
  private def within(lev: Levenshtein, i: Int): Expression = {
    val k = Literal(i)
    And(LessThanOrEqual(lengthGap(lev), k),
      GreaterThanOrEqual(Levenshtein(lev.left, lev.right, Some(k)),
        Literal(0)))
  }

  /** `lev(a,b) = i`: band at i and demand the exact distance back. */
  private def exactly(lev: Levenshtein, i: Int): Expression = {
    val k = Literal(i)
    And(LessThanOrEqual(lengthGap(lev), k),
      EqualTo(Levenshtein(lev.left, lev.right, Some(k)), k))
  }

  /** `lev(a,b) > i`: the far-pair probe — length gap decides for free,
    * else −1 past the band means the distance exceeds it. */
  private def beyond(lev: Levenshtein, i: Int): Expression = {
    val k = Literal(i)
    Or(GreaterThan(lengthGap(lev), k),
      LessThan(Levenshtein(lev.left, lev.right, Some(k)), Literal(0)))
  }

  private def bandConjunct(e: Expression): Option[Expression] = e match {
    // distance-small spellings
    case LessThanOrEqual(lev: Levenshtein, k) if unbanded(lev) =>
      kValue(k).map(within(lev, _))
    case GreaterThanOrEqual(k, lev: Levenshtein) if unbanded(lev) =>
      kValue(k).map(within(lev, _))
    case LessThan(lev: Levenshtein, k) if unbanded(lev) =>
      kValue(k).filter(_ >= 1).map(i => within(lev, i - 1))
    case GreaterThan(k, lev: Levenshtein) if unbanded(lev) =>
      kValue(k).filter(_ >= 1).map(i => within(lev, i - 1))
    // exact-distance spellings
    case EqualTo(lev: Levenshtein, k) if unbanded(lev) =>
      kValue(k).map(exactly(lev, _))
    case EqualTo(k, lev: Levenshtein) if unbanded(lev) =>
      kValue(k).map(exactly(lev, _))
    // distance-large spellings (BETWEEN's lower conjunct)
    case GreaterThanOrEqual(lev: Levenshtein, k) if unbanded(lev) =>
      kValue(k).filter(_ >= 1).map(i => beyond(lev, i - 1))
    case LessThanOrEqual(k, lev: Levenshtein) if unbanded(lev) =>
      kValue(k).filter(_ >= 1).map(i => beyond(lev, i - 1))
    case GreaterThan(lev: Levenshtein, k) if unbanded(lev) =>
      kValue(k).map(beyond(lev, _))
    case LessThan(k, lev: Levenshtein) if unbanded(lev) =>
      kValue(k).map(beyond(lev, _))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      var changed = false
      val newCond = splitConjunctivePredicates(cond).map { c =>
        bandConjunct(c) match {
          case Some(r) => changed = true; r
          case None => c
        }
      }.reduce(And)
      if (changed) f.copy(condition = newCond) else f
  }
}
