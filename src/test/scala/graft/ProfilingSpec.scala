package graft

import graft.operators.Profiling

/** Pins the profiling contract: nulls counted per column, distinct excludes
  * nulls, all columns computed in the one pass. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: null counts, null-excluding distinct, row count per column") {
    val df = Seq(
      (Some(1), Some("a")),
      (Some(1), None),
      (Some(2), Some("b")),
      (None, Some("b"))
    ).toDF("x", "y")
    val out = Profiling.profile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x") == ((4L, 1L, 2L)))
    assert(out("y") == ((4L, 1L, 2L)))
  }
}
