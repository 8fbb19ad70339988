package graft

import graft.operators.Validation
import org.apache.spark.sql.functions._

/** The minimal validation_rules interpreter (SURVEY §8): range / regex /
  * not_null enforced, unknown rule strings carried as metadata only.
  */
class ValidationRulesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "bp", Some(80.0)),   // in range
    (2L, "bp", Some(150.0)),  // above range:0-120
    (3L, "bp", None),         // null passes range (nullability is separate)
    (4L, "hr", Some(-5.0)),   // below range:0-
    (5L, "hr", None),         // null fails not_null
    (6L, "wt", Some(70.0))    // unknown rule only: always ok
  ).toDF("id", "ftype", "value")

  private val rules = Map(
    "bp" -> Seq("range:0-120"),
    "hr" -> Seq("not_null", "range:0-"),
    "wt" -> Seq("unit:kg"))

  test("range / not_null / unknown rules produce the right reject reasons") {
    val out = Validation.withRuleValidation(df, "ftype", "value", rules)
      .select("id", "rule_reject_reason").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains("rule_violation:range:0-120"))
    assert(out(3L).isEmpty)
    assert(out(4L).contains("rule_violation:range:0-"))
    assert(out(5L).contains("rule_violation:not_null"))
    assert(out(6L).isEmpty)
  }

  test("rule precedence follows declaration order") {
    // hr declares not_null before range:0- — a null hits not_null first
    val nullHr = Seq((9L, "hr", Option.empty[Double])).toDF("id", "ftype", "value")
    val reason = Validation.withRuleValidation(nullHr, "ftype", "value", rules)
      .select("rule_reject_reason").as[String].head()
    assert(reason == "rule_violation:not_null")
  }

  test("regex and open-ended range bounds") {
    val d = Seq(("A1", "code"), ("zz", "code")).toDF("value", "ftype")
    val out = Validation.withRuleValidation(d, "ftype", "value",
        Map("code" -> Seq("regex:^[A-Z][0-9]$")))
      .select("value", "rule_valid").as[(String, Boolean)].collect().toMap
    assert(out("A1") && !out("zz"))

    val lowOnly = Validation.rulePredicate("range:5-", lit(4.0))
    val hiOnly  = Validation.rulePredicate("range:-5", lit(4.0))
    val checked = Seq((1)).toDF("x").select(lowOnly.as("lo"), hiOnly.as("hi"))
      .as[(Boolean, Boolean)].head()
    assert(checked == ((false, true)))
  }
}
