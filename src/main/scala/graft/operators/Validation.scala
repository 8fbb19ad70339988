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
    // coalesce: a NULL type makes isin() NULL, and `when(!NULL)` SKIPS the
    // branch under three-valued logic — a null-typed row would sail through
    // as valid even though it belongs to no registered feature
    val activeOk = coalesce(col(typeCol).isin(activeTypes: _*), lit(false))
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

  /** Interpreter for the reference's free-form per-feature
    * `validation_rules` strings (declared at feature_registry.py:80-82 but
    * never interpreted — the reference's _validate_value:558-577 checks only
    * the value's Python TYPE). We enforce a minimal documented subset at
    * ingest; anything else is carried as metadata only (reference parity):
    *
    *   - "range:lo-hi" → lo <= value <= hi (numeric; either bound may be
    *     omitted: "range:0-" = non-negative, "range:-100" = at most 100)
    *   - "regex:<pat>" → string form of value must match <pat>
    *   - "not_null"    → value must be non-null
    *
    * Each rule compiles to a Column predicate at plan-build time (the
    * registry is driver-side metadata, a few hundred features), so rule
    * checks run inside whole-stage codegen like every other validation —
    * no per-row interpreter at execution time.
    */
  private val RangeRule = """^range:(-?\d+(?:\.\d+)?)?-(-?\d+(?:\.\d+)?)?$""".r

  def rulePredicate(rule: String, value: Column): Column = rule.trim match {
    case RangeRule(lo, hi) =>
      val loOk = Option(lo).map(l => value >= l.toDouble).getOrElse(lit(true))
      val hiOk = Option(hi).map(h => value <= h.toDouble).getOrElse(lit(true))
      loOk && hiOk
    // ANCHORED: rlike uses find() semantics, so an unanchored pattern
    // accepts values that merely CONTAIN a match — "must match" means the
    // whole value does
    case r if r.startsWith("regex:") =>
      value.cast("string").rlike("^(?:" + r.stripPrefix("regex:") + ")$")
    case "not_null"                  => value.isNotNull
    case _                           => lit(true) // unknown rule: metadata-only
  }

  /** Applies per-feature-type rule sets: adds `rule_reject_reason` (first
    * violated rule, in declaration order, as "rule_violation:<rule>") and
    * `rule_valid`. NULL values pass every rule except "not_null" —
    * nullability is its own check (`is_nullable`), matching the reference's
    * early-return on None (_validate_value:560-561).
    */
  def withRuleValidation(
      df: DataFrame,
      typeCol: String,
      valueCol: String,
      rulesByType: Map[String, Seq[String]]): DataFrame = {
    val v = col(valueCol)
    def firstViolation(rules: Seq[String]): Column =
      rules.foldRight(lit(null).cast("string")) { (rule, rest) =>
        val applies =
          if (rule.trim == "not_null") !rulePredicate(rule, v)
          else v.isNotNull && !rulePredicate(rule, v)
        when(applies, lit(s"rule_violation:$rule")).otherwise(rest)
      }
    val reason = rulesByType.toSeq.sortBy(_._1).foldRight(lit(null).cast("string")) {
      case ((ftype, rules), rest) =>
        when(col(typeCol) === ftype, firstViolation(rules)).otherwise(rest)
    }
    df.withColumn("rule_reject_reason", reason)
      .withColumn("rule_valid", col("rule_reject_reason").isNull)
  }

  /** Referential-integrity check as an anti-join (reference group creation
    * validates member features exist, feature_registry.py:367-375): rows of
    * `child` whose `childKey` has no match in `parent.parentKey`.
    * Catalyst plans a broadcast anti-join when parent is small.
    */
  def orphans(child: DataFrame, parent: DataFrame, childKey: String, parentKey: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")
}
