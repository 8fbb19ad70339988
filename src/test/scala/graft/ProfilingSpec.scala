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

  test("skewAudit: whale key dominates the distribution; null key counts as a key") {
    // key a: 6 rows, b: 2, c: 1, null: 1 -> 10 rows over 4 keys
    val df = (Seq.fill(6)(Option("a")) ++ Seq.fill(2)(Option("b")) ++
      Seq(Option("c"), Option.empty[String])).toDF("k")
    val r = Profiling.skewAudit(df, Seq("k")).collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_n") == 6L)
    assert(r.getAs[Double]("avg_n") == 2.5)
    assert(r.getAs[Double]("skew_ratio") == 2.4)
    assert(r.getAs[Double]("top_share") == 0.6)
  }
}
