package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits over governed tables — the release-time
  * counterpart of the reference's PHI access control (its `phi_fields` /
  * masking registry, feature_registry.py:86-101): masking hides a column,
  * but a quasi-identifier COMBINATION can still single a patient out. These
  * audits quantify that risk before a dataset leaves the platform.
  *
  * Scale shape: both audits are one hash-aggregate shuffle on the
  * quasi-identifier key (rows ∝ equivalence classes, not data); the
  * summary variants fold the class frame into one row. No windows, no
  * joins, no driver round-trips — a 100 TB table audits in one pass.
  */
object Privacy {

  /** k-anonymity audit: one row per quasi-identifier equivalence class
    * with its size and an `at_risk` flag (class smaller than k — an
    * attacker knowing the quasi-identifiers pins the subject to fewer than
    * k candidate rows). Null quasi values form their own class (groupBy
    * semantics), matching the conservative reading that "unknown" is still
    * a linkable value.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier column")
    // a non-positive k marks EVERY class safe — a release gate that always
    // passes is a config bug, not an audit
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity audit: per equivalence class, the number of DISTINCT
    * sensitive values (a k-anonymous class whose sensitive attribute is
    * constant still leaks it — homogeneity attack). `diverse` = at least
    * l distinct sensitive values observed. Null sensitive values are not
    * counted as a distinct value (countDistinct semantics): a null reveals
    * nothing to link.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l") // l=0 marks every class diverse
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}
