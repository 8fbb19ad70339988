package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time validation (reference: ingest_feature_value,
  * /root/reference/src/registry/feature_registry.py:400-441 — active-status
  * gate :423-424, type/value check :427-428 via _validate_value :558-577).
  *
  * Expressed as declarative predicates so validation runs inside the scan
  * stage (whole-stage codegen, pushdown-friendly) instead of per-row
  * imperative checks. Invalid rows are routed, not thrown: at 100 TB a
  * poison row must land in a reject sink, not kill the job.
  */
object Validation {

  /** Adds `is_valid` + `reject_reason` columns. Checks, in reference order:
    * feature/type is registered+active; value is non-null (unless nullable);
    * value passes the range rule.
    */
  def withValidation(
      df: DataFrame,
      typeCol: String,
      valueCol: String,
      activeTypes: Seq[String],
      minValue: Option[Double] = None
  ): DataFrame = {
    val activeOk = col(typeCol).isin(activeTypes: _*)
    val nonNull  = col(valueCol).isNotNull
    val rangeOk  = minValue.map(m => col(valueCol) >= m).getOrElse(lit(true))
    df.withColumn(
        "reject_reason",
        when(!activeOk, lit("feature_not_active"))     // feature_registry.py:423-424
          .when(!nonNull, lit("null_value"))           // _validate_value — type check :427-428
          .when(!rangeOk, lit("range_violation"))
          .otherwise(lit(null).cast("string"))
      )
      .withColumn("is_valid", col("reject_reason").isNull)
  }

  /** The validated-append ingest: valid rows stamped with an explicit
    * created_timestamp (bitemporal created side, feature_registry.py:435 —
    * `now` is a parameter for determinism).
    */
  def validatedAppend(
      df: DataFrame,
      typeCol: String,
      valueCol: String,
      activeTypes: Seq[String],
      createdTs: Column
  ): DataFrame =
    withValidation(df, typeCol, valueCol, activeTypes)
      .where(col("is_valid"))
      .drop("is_valid", "reject_reason")
      .withColumn("created_timestamp", createdTs)

  /** Referential-integrity check as an anti-join (reference group creation
    * validates member features exist, feature_registry.py:367-375): rows of
    * `child` whose `childKey` has no match in `parent.parentKey`.
    * Catalyst plans a broadcast anti-join when parent is small.
    */
  def orphans(child: DataFrame, parent: DataFrame, childKey: String, parentKey: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")
}
