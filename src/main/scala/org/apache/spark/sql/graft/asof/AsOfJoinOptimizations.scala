package org.apache.spark.sql.graft.asof

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for the custom as-of node.
  *
  * Catalyst's PushDownPredicates has no idea what [[AsOfJoinNode]] is, so a
  * Filter sitting above it never reaches the parquet scans below — exactly
  * the pushdown a foreign operator silently loses. This rule restores it:
  * a conjunct that references only spine (left) attributes moves below the
  * node onto the spine child. (Right-side conjuncts must NOT move: a fact
  * that fails the output predicate still participates in carry-forward
  * state, so filtering facts early would change which row is "latest".)
  *
  * BATCH PLACEMENT MATTERS: injected via GraftExtensions this runs in the
  * operator-optimization batch, BEFORE scan planning, so the pushed Filter
  * reaches the data source (file/row-group pruning). The self-installing
  * fallback in `AsOfJoin.native` uses `experimental.extraOptimizations`,
  * which Catalyst runs as the LAST batch — there the push still prunes
  * rows before the shuffle, but the scan itself was already planned, so
  * source-level pruning needs the extensions path.
  */
object AsOfJoinPredicatePushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val leftAttrs = AttributeSet(j.left.output)
      val conjuncts = splitConjunctivePredicates(cond)
      val (pushable, kept) = conjuncts.partition(c => c.references.subsetOf(leftAttrs) && c.deterministic)
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), j.left))
        kept.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
  // splitConjunctivePredicates comes from PredicateHelper — the same trait
  // every built-in pushdown rule mixes in (a private re-implementation
  // could drift from Catalyst's)
}
