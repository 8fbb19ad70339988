package graft

/** Guard rail: no declared query may plan a non-broadcast cartesian product
  * (the silent scale-killer). Broadcast nested-loop joins against the tiny
  * query/dim side are fine — those are deliberate.
  */
class PlanAuditSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("every query with an oracle is actually declared (and vice versa)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${(o -- q).mkString(", ")}")
  }
}
