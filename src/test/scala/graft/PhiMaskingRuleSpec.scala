package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PhiMaskingRule

class PhiMaskingRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](rule: PhiMaskingRule)(body: => T): T = {
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
  }

  private def patients = Seq(
    ("p1", 72.0, "AB+"), ("p2", 88.0, "O-")
  ).toDF("patient_id", "heart_rate", "blood_type")

  test("denied user: protected column nulled across arbitrary queries") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("analyst"))
    withRule(rule) {
      val out = patients.select($"patient_id", $"blood_type", $"heart_rate" * 2)
      val rows = out.orderBy("patient_id").collect()
      assert(rows.forall(_.isNullAt(1)))            // masked
      assert(rows.map(_.getDouble(2)).toSeq == Seq(144.0, 176.0)) // untouched col fine
      // masking also applies under aggregation, not just projection
      val agg = patients.groupBy($"blood_type").count().collect()
      assert(agg.length == 1 && agg.head.isNullAt(0))
    }
  }

  test("authorized user: plan untouched") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq("doctor"))
    withRule(rule) {
      val rows = patients.select($"blood_type").orderBy("blood_type").as[String].collect()
      assert(rows.toSeq == Seq("AB+", "O-"))
    }
  }

  test("rule is idempotent (no nested rewrites on repeated application)") {
    val rule = PhiMaskingRule(Map("blood_type" -> Seq("doctor")), userRoles = Seq.empty)
    val plan0 = patients.queryExecution.analyzed
    val once = rule(plan0)
    val twice = rule(once)
    assert(once == twice)
  }
}
