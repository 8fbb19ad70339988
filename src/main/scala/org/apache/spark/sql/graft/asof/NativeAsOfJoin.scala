package org.apache.spark.sql.graft.asof

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native partitioned merge-scan as-of join (SURVEY.md §4: "if still hot at
  * 100 TB: custom SparkStrategy for a partitioned merge-scan as-of join —
  * the only place a custom strategy is plausibly warranted").
  *
  * Physical contract: both sides hash-clustered on the key and sorted by
  * (key, ts) — EnsureRequirements inserts the exchanges/sorts exactly as it
  * does for SortMergeJoin — then ONE forward pass per partition merges them:
  * for each spine row, the right iterator advances through facts with
  * (key < spineKey) or (key == spineKey && ts <= spineTs), remembering the
  * last fact per key. O(S + F) per partition, zero intermediate rows, no
  * window buffer: strictly less work than both the theta-join (O(S*F) pairs)
  * and the union+window LOCF (sorts S+F rows together and carries struct
  * state through a window frame).
  *
  * Semantics identical to graft.operators.AsOfJoin.locf (differentially
  * tested): inclusive `ts <=`, equal-ts ties resolved to the greatest
  * tie column (right side is additionally sorted by the tie expression),
  * unmatched spine rows null-extended. Null keys behave like the LOCF
  * window form (null is a key value), and null fact timestamps sort first,
  * matching `<=` never.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object NativeAsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rtie) =>
      AsOfJoinExec(lk, rk, lts, rts, rtie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  // spine rows pass through untouched, in order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending) :+ SortOrder(rightTie, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val ltsExpr = leftTs; val rtsExpr = rightTs
    val out = output
    val nRight = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val boundLts = BindReferences.bindReference(ltsExpr, lOut)
      val boundRts = BindReferences.bindReference(rtsExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joiner = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(nRight)
      val resultProj = UnsafeProjection.create(out, out)
      val rIter = rIter0.buffered

      var carriedKey: UnsafeRow = null
      var carriedFact: InternalRow = null

      def tsOf(e: Expression, row: InternalRow): Long = {
        val v = e.eval(row)
        if (v == null) Long.MinValue else v.asInstanceOf[Long]
      }

      lIter.map { lrow =>
        val lkey = lKeyProj(lrow)
        val lts = tsOf(boundLts, lrow)
        var advance = true
        while (advance && rIter.hasNext) {
          val head = rIter.head
          val cmp = keyOrd.compare(rKeyProj(head), lkey)
          if (cmp < 0 || (cmp == 0 && tsOf(boundRts, head) <= lts)) {
            val r = rIter.next()
            carriedKey = rKeyProj(r).copy()
            carriedFact = r.copy()
          } else {
            advance = false
          }
        }
        val matched = carriedFact != null &&
          keyOrd.compare(carriedKey, lkey) == 0 &&
          tsOf(boundRts, carriedFact) <= lts
        resultProj(joiner(lrow, if (matched) carriedFact else nullRight))
      }
    }
  }
}
