package graft

import org.apache.spark.sql.functions._
import graft.operators.Latest

class LatestSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    ("u1", "f1", 1.0, ts("2024-01-01 00:00:00"), 1L),
    ("u1", "f1", 2.0, ts("2024-01-03 00:00:00"), 2L),
    ("u1", "f1", 3.0, ts("2024-01-03 00:00:00"), 3L), // tie on ts -> tie 3 wins
    ("u1", "f2", 4.0, ts("2024-01-02 00:00:00"), 4L),
    ("u2", "f1", 5.0, ts("2024-01-09 00:00:00"), 5L)
  ).toDF("e", "f", "v", "t", "id")

  test("latestAgg picks max (ts, tie) per key") {
    val m = Latest.latestAgg(log, Seq("e", "f"), "t", "id", Seq("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("u1", "f1")) == 3.0)
    assert(m(("u1", "f2")) == 4.0)
    assert(m(("u2", "f1")) == 5.0)
  }

  test("asOf filter excludes later rows; agg and window forms agree") {
    val asOf = Some(lit("2024-01-02 00:00:00").cast("timestamp"))
    val agg = Latest.latestAgg(log, Seq("e", "f"), "t", "id", Seq("v"), asOf)
      .orderBy("e", "f").select("e", "f", "v").collect().map(_.toString).toSeq
    val win = Latest.latestWindow(log, Seq("e", "f"), "t", "id", asOf)
      .orderBy("e", "f").select("e", "f", "v").collect().map(_.toString).toSeq
    assert(agg == win)
    assert(agg.size == 2) // u1/f1@Jan1 and u1/f2@Jan2; u2 has nothing <= asOf
  }

  test("lwwUpsert == full recompute, and is idempotent") {
    val base = log.where($"t" <= lit("2024-01-02 00:00:00").cast("timestamp"))
    val updates = log.where($"t" > lit("2024-01-02 00:00:00").cast("timestamp"))
    val cols = Seq("e", "f", "v", "t")
    val merged = Latest.lwwUpsert(base, updates, Seq("e", "f"), "t", "id", Seq("v"))
    val full = Latest.latestAgg(log, Seq("e", "f"), "t", "id", Seq("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr(cols: _*).orderBy("e", "f").collect().toSeq
    assert(rows(merged) == rows(full))
    // idempotence: applying the same updates again changes nothing
    val twice = Latest.lwwUpsert(merged, updates, Seq("e", "f"), "t", "id", Seq("v"))
    assert(rows(twice) == rows(full))
  }
}
