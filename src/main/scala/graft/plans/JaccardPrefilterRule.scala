package graft.plans

import graft.functions.JaccardSim
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThanOrEqual, Greatest, Least, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a filter `jaccard_sim(a, b) >= τ` gains the size-ratio
  * guard `least(size(a), size(b)) >= τ * greatest(size(a), size(b))` as a
  * LEADING conjunct.
  *
  * The theorem that makes this a pure optimization:
  * J(A,B) = |A∩B| / |A∪B| ≤ min(|A|,|B|) / max(|A|,|B|), so J ≥ τ IMPLIES
  * the guard — adding it can never change the result set. The guard costs
  * two array-length reads where the jaccard kernel walks both arrays
  * (O(|A|+|B|) hash-set intersection), and `And` short-circuits in both
  * interpreted and codegen evaluation, so mismatched-size pairs — the
  * bulk of a skewed near-dup candidate set — never pay the kernel.
  * NearDup's hand-written queries apply this guard manually
  * (dedup_ngram_jaccard); the rule gives the same protection to a USER's
  * naive `filter("jaccard_sim(a, b) >= 0.5")`, which is the point of
  * shipping it as a session extension: the library's optimization
  * knowledge applies to queries the library didn't write.
  *
  * Null semantics are unchanged: if either side is NULL the guard is NULL
  * and the original conjunct was already NULL — the filter drops the row
  * either way. Idempotent by construction: the rule skips any filter that
  * already carries a least-of-sizes guard (its own output shape), so the
  * fixed-point optimizer batch converges after one rewrite. */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  private def guardOf(a: Expression, b: Expression, t: Expression): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Size(a), Size(b))), DoubleType),
      Multiply(t, Cast(Greatest(Seq(Size(a), Size(b))), DoubleType)))

  private def hasGuard(cond: Expression): Boolean = cond.exists {
    case GreaterThanOrEqual(Cast(Least(Seq(_: Size, _: Size)), _, _, _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !hasGuard(cond) =>
      val guards = cond.collect {
        // the threshold may still be `cast(0.5 as double)` pre-folding —
        // any deterministic foldable double works (it evaluates once)
        case GreaterThanOrEqual(JaccardSim(a, b), t)
            if t.foldable && t.deterministic && t.dataType == DoubleType =>
          guardOf(a, b, t)
      }
      if (guards.isEmpty) f
      else Filter(And(guards.reduce(And), cond), child)
  }
}
