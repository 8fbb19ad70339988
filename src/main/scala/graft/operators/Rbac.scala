package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PHI role-based access control as relational operators (reference:
  * /root/reference/src/registry/feature_registry.py:469-475 role
  * intersection; deny->null masking in get_feature_vector :526-528;
  * registration constraints :286-291).
  *
  * Row/column-level security is a filter/projection — applied at read time
  * it rides predicate pushdown; no per-row Python checks.
  */
object Rbac {

  /** True when the user may read: non-PHI is world-readable; PHI requires a
    * non-empty role intersection (arrays_overlap = the reference's
    * `any(r in feature.access_roles ...)` loop, feature_registry.py:471).
    */
  def allowed(phiLevel: Column, accessRoles: Column, userRoles: Seq[String]): Column =
    phiLevel === "none" ||
      arrays_overlap(accessRoles, array(userRoles.map(lit): _*))

  /** Deny -> null column masking (reference catches PermissionError and
    * substitutes None, feature_registry.py:526-528). */
  def mask(value: Column, phiLevel: Column, accessRoles: Column, userRoles: Seq[String]): Column =
    when(allowed(phiLevel, accessRoles, userRoles), value).otherwise(lit(null))

  /** Registration-time constraint (feature_registry.py:286-291): phi_level
    * must be a known vocabulary value, and PHI features must declare at
    * least one access role. Use as a validation predicate on catalog writes.
    */
  def registrationValid(phiLevel: Column, accessRoles: Column): Column =
    phiLevel.isin("none", "indirect", "direct") &&
      (phiLevel === "none" || (accessRoles.isNotNull && size(accessRoles) > 0))
}
