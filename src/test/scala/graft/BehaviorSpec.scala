package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Pins the event-sequence analytics semantics: sequential funnel anchoring
  * (a stage only counts at-or-after the previous stage's anchor), cohort
  * bucketing by first-event period, and duration-weighted averaging.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, String, String)*) =
    rows.map { case (u, t, typ) => (u, ts(t), typ) }.toDF("u", "t", "typ")

  test("funnelDepth: in-order progression only; ties count; pre-anchor events don't") {
    val events = ev(
      // a: full view -> click -> purchase, in order
      ("a", "2024-01-01 00:00:00", "view"),
      ("a", "2024-01-02 00:00:00", "click"),
      ("a", "2024-01-03 00:00:00", "purchase"),
      // b: clicked only BEFORE ever viewing -> stuck at depth 1
      ("b", "2024-01-02 00:00:00", "view"),
      ("b", "2024-01-01 00:00:00", "click"),
      ("b", "2024-01-03 00:00:00", "purchase"), // purchase needs a click anchor
      // c: view and purchase but no click -> depth 1 (sequential, not set)
      ("c", "2024-01-01 00:00:00", "view"),
      ("c", "2024-01-02 00:00:00", "purchase"),
      // d: never viewed -> not a funnel entity at all
      ("d", "2024-01-01 00:00:00", "click"),
      ("d", "2024-01-02 00:00:00", "purchase"),
      // e: click at the SAME instant as view -> tie counts as progression
      ("e", "2024-01-01 00:00:00", "view"),
      ("e", "2024-01-01 00:00:00", "click"),
      // f: clicked before AND after viewing -> the post-view click anchors
      ("f", "2024-01-02 00:00:00", "view"),
      ("f", "2024-01-01 00:00:00", "click"),
      ("f", "2024-01-05 00:00:00", "click"),
      ("f", "2024-01-06 00:00:00", "purchase"))
    val d = Behavior.funnelDepth(events, "u", "t", "typ", Seq("view", "click", "purchase"))
      .select("u", "depth").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(d == Map("a" -> 3, "b" -> 1, "c" -> 1, "e" -> 2, "f" -> 3))
    assert(!d.contains("d"))

    // f's click anchor must be the POST-view click, not the earlier one
    val f = Behavior.funnelDepth(events, "u", "t", "typ", Seq("view", "click", "purchase"))
      .where(col("u") === "f").select("first_1").collect().head.getTimestamp(0)
    assert(f == ts("2024-01-05 00:00:00"))
  }

  test("funnel: counts per stage and conversion ratio vs stage 1") {
    val events = ev(
      ("a", "2024-01-01 00:00:00", "view"), ("a", "2024-01-02 00:00:00", "click"),
      ("b", "2024-01-01 00:00:00", "view"), ("b", "2024-01-02 00:00:00", "click"),
      ("c", "2024-01-01 00:00:00", "view"),
      ("d", "2024-01-01 00:00:00", "view"))
    val out = Behavior.funnel(events, "u", "t", "typ", Seq("view", "click"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 2L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5))
  }

  test("cohortRetention: first-period cohort, distinct entities per offset") {
    val events = ev(
      // u1 first active period 0, returns period 1 and 2 (twice — distinct!)
      ("u1", "2024-01-01 00:00:00", "x"),
      ("u1", "2024-01-02 00:00:00", "x"),
      ("u1", "2024-01-03 00:00:00", "x"),
      ("u1", "2024-01-03 06:00:00", "x"),
      // u2 first active period 0 only
      ("u2", "2024-01-01 12:00:00", "x"),
      // u3 first active period 2
      ("u3", "2024-01-03 00:00:00", "x"))
    val out = Behavior.cohortRetention(events, "u", "t",
        t => datediff(to_date(t), lit("2024-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // u1, u2 in day-0 cohort at offset 0
      (0L, 1L) -> 1L, // u1 returned next day
      (0L, 2L) -> 1L, // u1 on day 2 — counted once despite two events
      (2L, 0L) -> 1L)) // u3's own cohort
  }

  test("timeWeightedAvg: duration weighting, window clamp, out-of-window drop") {
    // window [00:00, 01:00): value 10 holds 15 min, then 30 holds 45 min
    // -> twavg = (10*900 + 30*2700) / 3600 = 25.0
    val obs = Seq(
      ("u", ts("2024-01-01 00:00:00"), 10.0),
      ("u", ts("2024-01-01 00:15:00"), 30.0),
      ("u", ts("2023-12-31 23:00:00"), 999.0), // before window: dropped
      ("u", ts("2024-01-01 01:00:00"), 999.0), // at end (exclusive): dropped
      ("v", ts("2024-01-01 00:30:00"), 8.0)    // single obs holds to end
    ).toDF("u", "t", "v")
    val out = Behavior.timeWeightedAvg(obs, "u", "t", "v",
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-01 01:00:00").cast("timestamp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out("u") == (25.0, 2L))
    assert(out("v") == (8.0, 1L))
  }

  test("ohlc: first/last by (ts, tie), extremes, null values excluded") {
    val obs = Seq(
      // same bucket, same entity; ties at 00:00 broken by the id column
      ("e", ts("2024-01-01 00:00:00"), 1L, Some(5.0)),
      ("e", ts("2024-01-01 00:00:00"), 0L, Some(3.0)),  // tie winner: open = 3
      ("e", ts("2024-01-01 12:00:00"), 2L, Some(9.0)),  // high
      ("e", ts("2024-01-01 23:00:00"), 3L, Some(1.0)),  // low AND close
      ("e", ts("2024-01-01 06:00:00"), 4L, None),       // null: excluded entirely
      ("e", ts("2024-01-02 00:00:00"), 5L, Some(7.0)))  // next bucket
      .toDF("e", "t", "id", "v")
    val out = Behavior.ohlc(obs, "e",
        org.apache.spark.sql.functions.date_format(col("t"), "yyyy-MM-dd"), "v",
        Seq("t", "id"))
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(out("2024-01-01") == ((3.0, 9.0, 1.0, 1.0, 4L)))
    assert(out("2024-01-02") == ((7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("rollingActives: window distinct vs daily distinct, per-day dedup, no phantom days") {
    val obs = Seq(
      ("a", ts("2024-01-01 09:00:00")), ("a", ts("2024-01-01 17:00:00")), // same day: 1 active
      ("b", ts("2024-01-01 12:00:00")),
      ("a", ts("2024-01-03 00:00:00")),
      ("c", ts("2024-01-09 00:00:00"))) // far gap: day 1/3 fall out of its window
      .toDF("u", "t")
    val out = Behavior.rollingActives(obs, "u", "t", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "2024-01-01" -> ((2L, 2L)),  // a,b that day; window [Dec30..Jan1] = {a,b}
      "2024-01-03" -> ((1L, 2L)),  // a that day; window [Jan1..Jan3] = {a,b}
      "2024-01-09" -> ((1L, 1L)))) // c only; and no rows for inactive days
  }

  test("transitions: per-entity lag steps, first event contributes none, p sums to 1 per prev") {
    val events = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "view"),
      ("u2", 1L, "view"), ("u2", 2L, "view"),
      ("u3", 1L, "click")) // single event: no step
      .toDF("u", "seq", "typ")
    val out = Behavior.transitions(events, "u", "typ", Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("trailingEvents: oldest-first context, current excluded, nulls skipped, per-entity") {
    val df = Seq(
      (1L, "u", Some("A")), (2L, "u", Some("B")), (3L, "u", None),
      (4L, "u", Some("D")), (5L, "u", Some("E")),
      (6L, "v", Some("Z"))
    ).toDF("id", "user", "typ")
    val out = Behavior
      .trailingEvents(df, "user", Seq("id"), "typ", n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "")           // first event: empty context
    assert(out(2L) == "A")
    assert(out(3L) == "A|B")
    assert(out(4L) == "A|B")        // null row occupies a frame slot but carries no action
    assert(out(5L) == "B|D")        // frame is the last 3 ROWS (ids 2,3,4); null skipped
    assert(out(6L) == "")           // entities are independent
  }
}
