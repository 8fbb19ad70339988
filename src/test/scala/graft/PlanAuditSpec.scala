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

  test("filters and projections reach the parquet scan (pushdown + pruning)") {
    val dir = "/root/testdata/sf0.001"
    // c1: equality + range filters must appear as PushedFilters on the
    // customer scan, and the scan must NOT read every customer column
    val df = SparkEntry.queries("c1_filter_project")(spark, dir)
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    val custScan = leaves.find(_.toString.contains("customer"))
      .getOrElse(fail(s"no customer scan:\n${leaves.map(_.toString)}"))
    // the predicate must be INSIDE the PushedFilters bracket — a bare
    // substring check passes vacuously on "PushedFilters: []"
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(custScan.toString).map(_.group(1)).getOrElse("")
    assert(pushed.contains("c_mktsegment"), s"filter not pushed; PushedFilters=[$pushed]")
    // pruning: check the scan's actual output attributes, not the plan
    // string (toString truncates ReadSchema at maxMetadataStringLength)
    val outCols = custScan.output.map(_.name).toSet
    assert(!outCols.contains("c_comment") && outCols.contains("c_custkey"),
      s"column pruning lost — scan outputs $outCols")
  }
}
