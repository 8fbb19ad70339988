package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Pins the reference's as-of semantics (SURVEY.md §5.3 edge cases):
  * empty match -> null (feature_registry.py:486-487), exclusion of facts
  * after as_of (:483), inclusive <=, and the (ts, tie) desc tie-break.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    // key, ts, tie, value
    ("u1", ts("2024-01-01 00:00:00"), 1L, 10.0),
    ("u1", ts("2024-01-05 00:00:00"), 2L, 20.0),
    ("u1", ts("2024-01-05 00:00:00"), 3L, 30.0), // equal-ts tie: higher tie wins
    ("u1", ts("2024-01-09 00:00:00"), 4L, 40.0), // after spine ts: excluded
    ("u2", ts("2024-01-08 00:00:00"), 5L, 50.0)
  ).toDF("k", "fts", "tie", "v")

  private def spine = Seq(
    ("u1", ts("2024-01-05 00:00:00"), "s1"), // exactly at fact ts: inclusive
    ("u1", ts("2024-01-02 00:00:00"), "s2"),
    ("u2", ts("2024-01-01 00:00:00"), "s3"), // before all u2 facts: null
    ("u3", ts("2024-01-05 00:00:00"), "s4")  // key with no facts: null
  ).toDF("k", "sts", "tag")

  private def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Seq[String], String, String, Seq[String], String, String) => org.apache.spark.sql.DataFrame) =
    f(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie", "")
      .select("tag", "v")
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap

  test("locf: inclusive <=, tie-break max tie, null when empty") {
    val m = run(AsOfJoin.locf)
    assert(m("s1") == 30.0) // equal-ts fact visible; tie 3 beats tie 2
    assert(m("s2") == 10.0)
    assert(m("s3") == null) // no fact <= as_of
    assert(m("s4") == null) // unknown key
  }

  test("thetaWindow agrees with locf on the edge cases") {
    assert(run(AsOfJoin.thetaWindow) == run(AsOfJoin.locf))
  }

  test("native merge-scan exec agrees with locf on the edge cases") {
    assert(run(AsOfJoin.native) == run(AsOfJoin.locf))
  }

  test("native merge-scan exec agrees with locf on generated data") {
    val f = (1 to 500).map { i =>
      (s"u${i % 7}", ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"), i.toLong, i.toDouble)
    }.toDF("k", "fts", "tie", "v")
    val s = (1 to 200).map { i =>
      (s"u${i % 9}", ts(f"2024-01-${(i * 3) % 28 + 1}%02d ${(i * 7) % 24}%02d:30:00"), s"s$i")
    }.toDF("k", "sts", "tag")
    val a = AsOfJoin.native(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    val b = AsOfJoin.locf(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("locf and thetaWindow agree on generated data") {
    val f = (1 to 500).map { i =>
      (s"u${i % 7}", ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"), i.toLong, i.toDouble)
    }.toDF("k", "fts", "tie", "v")
    val s = (1 to 200).map { i =>
      (s"u${i % 9}", ts(f"2024-01-${(i * 3) % 28 + 1}%02d ${(i * 7) % 24}%02d:30:00"), s"s$i")
    }.toDF("k", "sts", "tag")
    val a = AsOfJoin.locf(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    val b = AsOfJoin.thetaWindow(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("native exec participates in whole-stage codegen; codegen == interpreted output") {
    val f = (1 to 500).map { i =>
      (s"u${i % 7}", ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"), i.toLong, i.toDouble)
    }.toDF("k", "fts", "tie", "v")
    val s = (1 to 200).map { i =>
      (s"u${i % 9}", ts(f"2024-01-${(i * 3) % 28 + 1}%02d ${(i * 7) % 24}%02d:30:00"), s"s$i")
    }.toDF("k", "sts", "tag")
    def result() = AsOfJoin.native(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq

    val withCodegen = result()
    // the exec must actually be INSIDE a WholeStageCodegen span (marked *(n));
    // materialize first — under AQE the final plan only exists post-execution
    val df = AsOfJoin.native(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("AsOfJoin") && l.contains("*")), s"exec not codegen'd:\n$plan")

    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(result() == withCodegen)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("optimizer rule pushes spine-only filters below the native as-of node") {
    val out = AsOfJoin.native(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .where(col("tag") === "s1")
    // semantics: filter applies, result unchanged vs filtering after collect
    val viaFilter = out.collect().map(r => r.getString(2)).toSeq
    assert(viaFilter == Seq("s1"))
    // plan: the Filter moved below AsOfJoinExec (no Filter above it)
    val plan = out.queryExecution.optimizedPlan
    val topIsFilterOverAsOf = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[org.apache.spark.sql.graft.asof.AsOfJoinNode] => f
    }
    assert(topIsFilterOverAsOf.isEmpty, s"filter not pushed:\n$plan")
  }

  test("locfSalted agrees with locf (edge cases and generated data)") {
    def runSalted(sp: org.apache.spark.sql.DataFrame, f: org.apache.spark.sql.DataFrame) =
      AsOfJoin.locfSalted(sp, f, Seq("k"), "sts", "fts", Seq("v"), "tie", saltBuckets = 4)
    val edge = runSalted(spine, facts).select("tag", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(edge == run(AsOfJoin.locf))

    val f = (1 to 400).map { i =>
      (s"u${i % 5}", ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"), i.toLong, i.toDouble)
    }.toDF("k", "fts", "tie", "v")
    val s = (1 to 150).map { i =>
      (s"u${i % 6}", ts(f"2024-01-${(i * 5) % 28 + 1}%02d ${(i * 11) % 24}%02d:30:00"), s"s$i")
    }.toDF("k", "sts", "tag")
    val a = runSalted(s, f).orderBy("tag").collect().map(_.toString).toSeq
    val b = AsOfJoin.locf(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("locfRouted agrees with locf (hot keys salted, tail plain, union complete)") {
    val f = (1 to 400).map { i =>
      // u0 is the "hot" key: over half the facts
      (if (i % 2 == 0) "u0" else s"u${i % 5}",
        ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"), i.toLong, i.toDouble)
    }.toDF("k", "fts", "tie", "v")
    val s = (1 to 150).map { i =>
      (s"u${i % 6}", ts(f"2024-01-${(i * 5) % 28 + 1}%02d ${(i * 11) % 24}%02d:30:00"), s"s$i")
    }.toDF("k", "sts", "tag")
    val a = AsOfJoin.locfRouted(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie",
        hotKeys = Seq("u0"), saltBuckets = 4)
      .orderBy("tag").collect().map(_.toString).toSeq
    val b = AsOfJoin.locf(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")
      .orderBy("tag").collect().map(_.toString).toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      AsOfJoin.locfRouted(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie",
        hotKeys = Seq.empty, saltBuckets = 4))
  }

  test("locfRouted and thetaWindow keep null-key rows, matching locf") {
    // `isin` is NULL for a null key, and NOT(NULL) is NULL too — without
    // null-safe routing a null-key spine row matched neither branch and
    // silently vanished; thetaWindow's === likewise no-matched null keys
    val f = Seq(("u1", ts("2024-01-01 00:00:00"), 1L, 10.0),
      (null.asInstanceOf[String], ts("2024-01-02 00:00:00"), 2L, 99.0))
      .toDF("k", "fts", "tie", "v")
    val s = Seq(("u1", ts("2024-01-05 00:00:00"), "s1"),
      (null.asInstanceOf[String], ts("2024-01-05 00:00:00"), "s_null"))
      .toDF("k", "sts", "tag")
    def out(df: org.apache.spark.sql.DataFrame) = df.select("tag", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val viaLocf = out(AsOfJoin.locf(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie"))
    assert(viaLocf == Map("s1" -> 10.0, "s_null" -> 99.0)) // null is a key value
    assert(out(AsOfJoin.locfRouted(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie",
      hotKeys = Seq("u1"), saltBuckets = 2)) == viaLocf)
    assert(out(AsOfJoin.thetaWindow(s, f, Seq("k"), "sts", "fts", Seq("v"), "tie")) == viaLocf)
  }

  test("locfBounded: stale matches null out, in-window matches identical to locf") {
    // tolerance 4 days: s1 matches the 01-05 fact (0s old, kept); s2's
    // match is the 01-01 fact (1 day old, kept); with tolerance 0 only
    // exact-timestamp matches survive
    val wide = AsOfJoin.locfBounded(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie",
      toleranceSec = 4L * 86400)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(wide("s1").contains(30.0) && wide("s2").contains(10.0))
    assert(wide("s3").isEmpty && wide("s4").isEmpty)

    val tight = AsOfJoin.locfBounded(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie",
      toleranceSec = 0L)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(tight("s1").contains(30.0), "an exactly-at-ts match is age 0, inside any tolerance")
    assert(tight("s2").isEmpty, "a 1-day-old match must null out under tolerance 0")

    // equivalence: bounded with a huge tolerance == plain locf
    val loose = AsOfJoin.locfBounded(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie",
      toleranceSec = 365L * 86400)
      .select("tag", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(loose == run(AsOfJoin.locf))
  }

  test("spine passthrough columns and timestamp column survive") {
    val out = AsOfJoin.locf(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")
    assert(out.columns.toSeq == Seq("k", "sts", "tag", "v", "fts__timestamp"))
  }

  test("a8_resample: dense daily grid, LOCF fill, nulls before first event") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("a8_resample")(spark, dir).cache()
    val ev = graft.sources.Tables.events(spark, dir)

    // dense grid: every user × every day in the span, exactly once
    val users = ev.select("user_id").distinct().count()
    assert(out.count() == users * 11) // 2024-01-10 .. 2024-01-20 inclusive
    assert(out.groupBy("user_id", "day").count().where(col("count") =!= 1).isEmpty)

    // LOCF correctness per cell: carried last_ts is the max event ts <= day end
    val expected = ev.select(col("user_id"), col("ts"))
      .join(out.select("user_id", "day"), Seq("user_id"))
      .where(col("ts") < (to_date(col("day")) + expr("interval 1 day")).cast("timestamp"))
      .groupBy("user_id", "day").agg(max("ts").as("exp_ts"))
    val joined = out.join(expected, Seq("user_id", "day"), "left")
    assert(joined.where(
      (col("last_ts").isNull && col("exp_ts").isNotNull) ||
      (col("last_ts").isNotNull && col("last_ts") =!= col("exp_ts"))).isEmpty)

    // a day strictly before a user's first event carries null value AND null ts
    assert(out.where(col("last_ts").isNull && col("value").isNotNull).isEmpty)
    out.unpersist()
  }
}
