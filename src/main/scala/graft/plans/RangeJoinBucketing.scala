package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a time-range join into a bucketed
  * equi-join.
  *
  * A join whose only usable predicate is
  * `0 <= b.ts - a.ts <= W` plans as a nested-loop (O(|A|·|B|))
  * because Catalyst finds no equality keys. But the range bound means
  * `bucket(b) ∈ {bucket(a), bucket(a)+1}` for `bucket(x) = x div W` —
  * so the join is equivalent to an equi-join on a derived bucket
  * column with the left side expanded to probe both buckets, keeping
  * the original predicate as a residual filter. That turns the
  * cartesian into a shuffle join, which is the difference between
  * infeasible and linear at 100 TB.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) or `spark.experimental.extraOptimizations`.
  * The rewritten join's bucket column is named so the rule does not
  * re-fire on its own output (the hosting batch runs to fixpoint).
  */
object RangeJoinBucketing extends Rule[LogicalPlan] with PredicateHelper {

  val BucketCol = "__graft_range_bucket"

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name == BucketCol) &&
          !right.output.exists(_.name == BucketCol) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // no equality keys the planner could already use
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) =>
          (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
            (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet))
        case _ => false
      }
      val range = conjuncts.collectFirst {
        case GreaterThanOrEqual(sub @ Subtract(b, a, _), Literal(0L, LongType))
            if a.dataType == LongType &&
              a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet) &&
              a.deterministic && b.deterministic =>
          conjuncts.collectFirst {
            case LessThanOrEqual(s2, Literal(hi: Long, LongType))
                if hi > 0 && s2.semanticEquals(sub) => (a, b, hi)
          }
      }.flatten
      range match {
        // Duplicating `left` into two probe branches is only sound when
        // both subtrees are deterministic — a rand()/uuid() source would
        // produce different rows per branch (missing/duplicate results).
        case Some((a, b, w)) if !hasEqui && left.deterministic && right.deterministic =>
          val wLit = Literal(w, LongType)
          def mkSide(ts: Expression, shift: Long): NamedExpression = {
            val bucket = new IntegralDivide(ts, wLit)
            val shifted = if (shift == 0) bucket else new Add(bucket, Literal(shift, LongType))
            Alias(shifted, BucketCol)()
          }
          val probe0 = Project(left.output :+ mkSide(a, 0L), left)
          val probe1 = Project(left.output :+ mkSide(a, 1L), left)
          val probes = Union(Seq(probe0, probe1))
          val lBucket = probes.output.last
          val buildAlias = mkSide(b, 0L)
          val build = Project(right.output :+ buildAlias, right)
          val newJoin = Join(probes, build, Inner,
            Some(And(cond, EqualTo(lBucket, buildAlias.toAttribute))), hint)
          // preserve the original output (drop the bucket columns)
          Project(left.output ++ right.output, newJoin)
        case _ => j
      }
  }
}
