package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project, SetOperation, Union}
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
  * gives the masked column a FRESH exprId and rewrites every upstream
  * reference to it — reusing the original exprId (the earlier design)
  * made the masking Project exprId-identical to a no-op, and optimizer
  * rules that compare outputs structurally (RemoveNoopOperators-style)
  * deleted it, returning real PHI under a filter. A metadata marker
  * recorded on the alias keeps the rewrite idempotent.
  *
  * Column names match through the session RESOLVER (case-insensitive under
  * the default spark.sql.caseSensitive=false, like Spark's own analysis) —
  * an exact-string compare would let a case mismatch between the conf and
  * the physical schema silently disable masking, which is a PHI leak, not
  * a config nit.
  *
  * Termination in the fixed-point batch: a leaf is wrapped only when a
  * denied attribute is actually CONSUMED (referenced by some operator's
  * expressions, or delivered in the plan's root output). ColumnPruning in
  * the same batch removes the masking alias when nothing reads the column;
  * without the consumption check the rule would re-wrap on the next
  * iteration and the batch would oscillate to its iteration cap. An
  * unconsumed denied column needs no mask — nothing reads it.
  *
  * Nullability: the mask replaces values with nulls, so every downstream
  * reference to a masked attribute is rewritten nullable — otherwise
  * NullPropagation folds `IS NOT NULL` on a masked-but-declared-
  * non-nullable column to true and filters contradict the projected nulls.
  */
case class PhiMaskingRule(
    protectedCols: Map[String, Seq[String]],
    userRoles: Seq[String])
  extends Rule[LogicalPlan] {

  private val MaskedKey = "graft.phi.masked"

  // DETERMINISTIC masked exprId: same numeric id as the original attribute,
  // fixed namespace UUID. Spark 4's hybrid analyzer runs analysis twice
  // (fixed-point + single-pass resolver) and compares; a freshly-allocated
  // NamedExpression.newExprId differs between the runs, and the mixed
  // trees fail at BindReferences with ATTRIBUTE_NOT_FOUND. The (id,
  // namespace) pair stays globally unique because original ids are.
  private val MaskNamespace =
    java.util.UUID.fromString("6d61736b-6772-6166-7400-000000000000")

  private def deniedName(name: String): Boolean =
    protectedCols.exists { case (c, roles) =>
      conf.resolver(c, name) && !roles.exists(userRoles.contains)
    }

  private def denied(a: Attribute): Boolean = deniedName(a.name)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maskedIds = plan.collect {
      case Project(projList, _) =>
        projList.collect { case al: Alias if al.metadata.contains(MaskedKey) => al.exprId }
    }.flatten.toSet

    // an attribute is consumed if any operator ABOVE the leaf references it
    // or the plan delivers it to the caller (root output). Leaves are
    // excluded: a leaf's `expressions` include its own output attributes
    // (constructor fields), which would mark every column self-consumed
    // and add one fresh wrap per analysis pass forever.
    val directlyConsumed =
      plan.collect { case n if !n.isInstanceOf[LeafNode] => n.expressions }
        .flatten.flatMap(_.references.map(_.exprId)).toSet ++
        plan.output.map(_.exprId)

    // Union/Except/Intersect expose only the FIRST (left) child's exprIds in
    // their output; later children's attributes are consumed POSITIONALLY,
    // never by exprId reference. Without this propagation,
    // `TABLE a UNION ALL TABLE b` would mask a's leaf but deliver b's raw
    // PHI — the consumption gate must not open that hole. Iterate to a fixed
    // point because set operations nest.
    val consumed = {
      var acc = directlyConsumed
      var changed = true
      while (changed) {
        changed = false
        plan.foreach { node =>
          val children = node match {
            case u: Union        => u.children
            case s: SetOperation => s.children
            case _               => Nil
          }
          children.foreach { child =>
            node.output.zip(child.output).foreach { case (out, in) =>
              if (acc(out.exprId) && !acc(in.exprId)) { acc += in.exprId; changed = true }
            }
          }
        }
      }
      acc
    }

    // old exprId -> the fresh masked attribute that replaces it upstream
    val rewrites = scala.collection.mutable.HashMap.empty[
      org.apache.spark.sql.catalyst.expressions.ExprId, Attribute]

    val masked = plan.transformUp {
      case leaf: LeafNode if leaf.output.exists(a =>
          denied(a) && !maskedIds(a.exprId) && consumed(a.exprId)) =>
        val projections = leaf.output.map { a =>
          if (denied(a) && !maskedIds(a.exprId) && consumed(a.exprId)) {
            // the role check is per-session static, so deny->null reduces to
            // a typed null literal at plan time — zero runtime cost. FRESH
            // exprId (see class doc) + nullable output by construction.
            val meta = new MetadataBuilder().withMetadata(a.metadata)
              .putBoolean(MaskedKey, value = true).build()
            val al = Alias(Literal.create(null, a.dataType), a.name)(
              exprId = org.apache.spark.sql.catalyst.expressions.ExprId(a.exprId.id, MaskNamespace),
              explicitMetadata = Some(meta))
            rewrites(a.exprId) = al.toAttribute
            al
          } else a
        }
        Project(projections, leaf)
    }

    // re-point every upstream reference at the masked attribute (nullable,
    // fresh id); the original id now exists only inside the leaf, so a
    // re-apply sees it unconsumed and the fixed point converges. LEAVES
    // ARE EXCLUDED: a leaf's output attributes live in its constructor
    // fields, so transformAllExpressions would rewrite the relation's own
    // output to the fresh id too — recreating the exprId-identity that
    // lets the optimizer delete the mask as a no-op
    if (rewrites.isEmpty) masked
    else masked.transformUp {
      case leaf: LeafNode => leaf
      case node => node.transformExpressions {
        case ar: AttributeReference if rewrites.contains(ar.exprId) => rewrites(ar.exprId)
      }
    }
  }
}
