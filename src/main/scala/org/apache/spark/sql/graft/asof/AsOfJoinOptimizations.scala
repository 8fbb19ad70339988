package org.apache.spark.sql.graft.asof

import org.apache.spark.sql.catalyst.expressions.AttributeSet
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
  */
object AsOfJoinPredicatePushdown extends Rule[LogicalPlan] {
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

  private def splitConjunctivePredicates(
      condition: org.apache.spark.sql.catalyst.expressions.Expression
  ): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = condition match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => other :: Nil
  }
}
