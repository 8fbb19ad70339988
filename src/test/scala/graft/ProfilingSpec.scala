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

  test("moments: matches closed forms on known distributions") {
    // symmetric two-point mass {0,10}: mean 5, skew 0, kurtosis -2 (Bernoulli)
    val sym = Seq(("a", 0.0), ("a", 10.0), ("a", 0.0), ("a", 10.0)).toDF("g", "v")
    val r = Profiling.moments(sym, "v", Seq("g")).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean") == 5.0)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-12)
    assert(math.abs(r.getAs[Double]("kurtosis") - (-2.0)) < 1e-9)
    // sample sd of {0,10,0,10}: sqrt(100/3)
    assert(math.abs(r.getAs[Double]("sd") - math.sqrt(100.0 / 3)) < 1e-9)

    // right-skewed mass {0,0,0,4}: skewness (3-2·0.75)/sqrt(0.75·0.25) expanded
    // for Bernoulli(p=1/4) scaled: skew = (1-2p)/sqrt(p(1-p)) = 0.5/sqrt(3/16)
    val skewed = Seq(("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 4.0)).toDF("g", "v")
    val r2 = Profiling.moments(skewed, "v", Seq("g")).collect().head
    assert(math.abs(r2.getAs[Double]("skewness") - 0.5 / math.sqrt(3.0 / 16)) < 1e-9)

    // constant group: sd defined (0), skew/kurt null (m2 = 0 guard)
    val const = Seq(("c", 2.0), ("c", 2.0)).toDF("g", "v")
    val r3 = Profiling.moments(const, "v", Seq("g")).collect().head
    assert(r3.getAs[Double]("sd") == 0.0)
    assert(r3.isNullAt(r3.fieldIndex("skewness")) && r3.isNullAt(r3.fieldIndex("kurtosis")))
  }

  test("entropy: uniform maxes at ln(k), constant is 0, herfindahl mirrors") {
    val df = (Seq.fill(5)(("u", "a")) ++ Seq.fill(5)(("u", "b")) ++
      Seq.fill(10)(("c", "x"))).toDF("g", "cat")
    val out = Profiling.entropy(df, "cat", Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("entropy"), r.getAs[Double]("herfindahl"), r.getAs[Long]("n_categories")))).toMap
    val (eU, hU, kU) = out("u")
    assert(math.abs(eU - math.log(2)) < 1e-12 && math.abs(hU - 0.5) < 1e-12 && kU == 2L)
    val (eC, hC, kC) = out("c")
    assert(eC == 0.0 && hC == 1.0 && kC == 1L)
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
