package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.MetadataBuilder

/** Engine-level row/column security: auto-inject PHI deny->null masking at
  * the scan (SURVEY.md §4's optional analyzer rule — the reference does this
  * imperatively per read, feature_registry.py:469-475 + :526-528; here it is
  * a plan rewrite, so EVERY query in the session is masked no matter who
  * wrote it).
  *
  * `protectedCols` maps a column name to the roles allowed to read it; a
  * session user holding none of them sees nulls. The injected Project
  * re-uses the original attribute exprIds (Alias with explicit exprId), so
  * upstream operators resolve unchanged; a metadata marker recorded on the
  * alias keeps the rewrite idempotent (the rule collects already-masked
  * exprIds before transforming, so the fixed-point runner converges after
  * one pass).
  */
case class PhiMaskingRule(
    protectedCols: Map[String, Seq[String]],
    userRoles: Seq[String])
  extends Rule[LogicalPlan] {

  private val MaskedKey = "graft.phi.masked"

  private def denied(a: Attribute): Boolean =
    protectedCols.contains(a.name) && !protectedCols(a.name).exists(userRoles.contains)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maskedIds = plan.collect {
      case Project(projList, _) =>
        projList.collect { case al: Alias if al.metadata.contains(MaskedKey) => al.exprId }
    }.flatten.toSet

    plan.transformUp {
      case leaf: LeafNode if leaf.output.exists(a => denied(a) && !maskedIds(a.exprId)) =>
        val projections = leaf.output.map { a =>
          if (denied(a) && !maskedIds(a.exprId)) {
            // the role check is per-session static, so deny->null reduces to
            // a typed null literal at plan time — zero runtime cost
            val meta = new MetadataBuilder().withMetadata(a.metadata)
              .putBoolean(MaskedKey, value = true).build()
            Alias(Literal.create(null, a.dataType), a.name)(exprId = a.exprId, explicitMetadata = Some(meta))
          } else a
        }
        Project(projections, leaf)
    }
  }
}
