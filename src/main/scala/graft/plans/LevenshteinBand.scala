package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: banded Levenshtein filters.
  *
  * `levenshtein(a, b) <= k` as written computes the FULL O(|a|·|b|)
  * dynamic program for every pair and then compares. For a near-dup
  * scan the threshold is tiny (k ≤ 2) and almost every candidate pair
  * misses, so nearly all of that work is wasted. This rule rewrites
  * the predicate inside filtering contexts to
  *
  * {{{ abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0 }}}
  *
  * - the length band is a free O(1) lower bound (edit distance can
  *   never beat the length difference) that short-circuits the DP
  *   entirely for most pairs (`And` evaluates left-to-right), and
  * - the surviving pairs run Spark's threshold form, whose banded DP
  *   visits O(k·min(|a|,|b|)) cells and exits early — it returns the
  *   exact distance when ≤ k and −1 otherwise, hence the `>= 0`
  *   comparison (NOT `<= k`, which the −1 sentinel would satisfy).
  *
  * The rewrite maps null → null and turns some nulls into false via
  * the length band, which is an equivalence only where null and false
  * both mean "drop the row" — so it fires inside `Filter` conditions
  * and `Join` conditions, never in projections. Registered per
  * session via [[GraftSparkExtensions]] (`injectOptimizerRule`) or at
  * runtime through `experimental.extraOptimizations`
  * (`graftbridge.Bridge.addOptimization`).
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def band(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), lit @ Literal(k: Int, IntegerType))
        if k >= 0 =>
      And(
        LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), lit),
        GreaterThanOrEqual(Levenshtein(a, b, Some(lit)), Literal(0)))
    case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 =>
      And(
        LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), lit),
        GreaterThanOrEqual(Levenshtein(a, b, Some(lit)), Literal(0)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val banded = band(cond)
      if (banded.fastEquals(cond)) f else f.copy(condition = banded)
    case j @ Join(_, _, _, Some(cond), _) =>
      val banded = band(cond)
      if (banded.fastEquals(cond)) j else j.copy(condition = Some(banded))
  }
}
