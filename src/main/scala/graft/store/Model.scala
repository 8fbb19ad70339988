package graft.store

import java.sql.Timestamp

/** Typed catalog model — 1:1 with the reference dataclasses (SURVEY.md §1.1).
  * Scala case classes give us Dataset[Feature] encoders for the registry
  * dimension; the big fact log stays an untyped DataFrame (§1.4).
  */

/** /root/reference/src/registry/feature_registry.py:71-94 */
case class FeatureSchemaMeta(
    name: String,
    value_type: String, // 11-value enum, feature_registry.py:29-42
    description: String = "",
    category: String = "demographic", // 12-value enum, :54-68
    entity_type: String = "patient",
    is_nullable: Boolean = true,
    default_value: Option[String] = None,
    validation_rules: Seq[String] = Seq.empty)

/** /root/reference/src/registry/feature_registry.py:97-114 */
case class FeatureSourceMeta(
    source_type: String, // batch | stream | derived, :101
    source_location: String = "",
    query: String = "",
    transformation_logic: String = "",
    refresh_frequency: String = "daily") // daily | hourly | realtime, :105

/** /root/reference/src/registry/feature_registry.py:117-154 */
case class Feature(
    feature_id: String,
    name: String,
    version: String,
    schema: FeatureSchemaMeta,
    source: FeatureSourceMeta,
    status: String, // draft | active | deprecated | archived, :48-51
    owner: String,
    created_at: Timestamp,
    updated_at: Timestamp,
    tags: Map[String, String] = Map.empty,
    dependencies: Seq[String] = Seq.empty,
    phi_level: String = "none", // none | indirect | direct, :134
    access_roles: Seq[String] = Seq.empty,
    retention_days: Int = 2555) // 7y HIPAA default, :136

/** /root/reference/src/registry/feature_registry.py:157-178 */
case class FeatureGroup(
    group_id: String,
    name: String,
    entity_type: String,
    features: Seq[String],
    description: String,
    owner: String,
    created_at: Timestamp)

/** Audit record (feature_registry.py:587-594, :603-609). */
case class AuditRecord(
    timestamp: Timestamp,
    action: String, // access | access_denied
    feature_id: String,
    entity_id: String,
    user_id: String,
    as_of: Option[Timestamp])

object Vocab {
  val ValueTypes: Set[String] = Set(
    "int32", "int64", "float32", "float64", "string", "bool", "timestamp",
    "array_int", "array_float", "array_string", "embedding") // feature_registry.py:29-42
  val Statuses: Set[String]  = Set("draft", "active", "deprecated", "archived")
  val PhiLevels: Set[String] = Set("none", "indirect", "direct") // :286-287
  val SourceTypes: Set[String] = Set("batch", "stream", "derived") // :101
}
