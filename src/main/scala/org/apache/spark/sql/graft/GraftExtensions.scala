package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-extension entry point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  * wires the engine's Catalyst surface into every query of the session:
  *
  *  - [[ConfPhiMaskingRule]] via `injectPostHocResolutionRule`: masking is
  *    applied at ANALYSIS time, strictly before every optimizer batch.
  *    That ordering is the security fix, twice over: (1) it precedes
  *    "Early Filter and Projection Push-Down" (V2ScanRelationPushDown),
  *    so by the time DSv2 pushdown bakes predicates into a scan, any
  *    predicate on a denied column already targets the masking Project's
  *    null literal — row membership cannot act as an oracle on protected
  *    values (the round-1 `experimental.extraOptimizations` wiring ran
  *    AFTER pushdown); and (2) it precedes NullPropagation, which would
  *    otherwise fold `IS NOT NULL` on a masked-but-declared-non-nullable
  *    column to true BEFORE an optimizer-batch mask could apply, making
  *    filters contradict the projected nulls. Masking binds when a query
  *    is ANALYZED: a Dataset built before a role-conf change keeps the
  *    masking of its creation time (re-create the frame after changing
  *    roles, as each new query does).
  *  - the native as-of join strategy + its pushdown rule, so
  *    `AsOfJoin.native` works without per-call self-installation;
  *  - the SQL function surface (vec_dot / cosine_sim) for spark.sql users.
  *
  * Masking is configured per session (it is session-state, like the
  * reference's per-request user roles) through runtime confs:
  * `spark.graft.phi.protected = col:roleA|roleB,col2:roleC` and
  * `spark.graft.phi.userRoles = roleA,roleD`. Unset = no masking.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(session => ConfPhiMaskingRule(session))
    ext.injectOptimizerRule(_ => asof.AsOfJoinPredicatePushdown)
    ext.injectPlannerStrategy(_ => asof.NativeAsOfStrategy)
    graft.functions.VectorExpressions.functions.foreach(ext.injectFunction)
  }
}

/** Conf-driven wrapper around [[PhiMaskingRule]]: re-reads the session's
  * `spark.graft.phi.*` confs on every apply, so masking follows the
  * current session user without rebuilding the session. No-op when the
  * protected-column conf is absent or empty.
  */
case class ConfPhiMaskingRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val protectedConf = session.conf.get("spark.graft.phi.protected", "")
    if (protectedConf.trim.isEmpty) return plan
    val protectedCols: Map[String, Seq[String]] = protectedConf.split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { entry =>
        val Array(colName, roles @ _*) = entry.split(":", 2)
        val roleList = roles.headOption.map(_.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty))
          .getOrElse(Seq.empty)
        colName.trim -> roleList
      }.toMap
    val userRoles = session.conf.get("spark.graft.phi.userRoles", "")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    PhiMaskingRule(protectedCols, userRoles).apply(plan)
  }
}
