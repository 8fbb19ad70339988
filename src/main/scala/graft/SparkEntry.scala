package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._
import graft.functions.Fns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query ids map to SURVEY.md §2's operator inventory (A1..G4). Every query
  * is deterministic (explicit as-of/now literals, pinned tie-breaks, ORDER
  * BY on output) so the DuckDB oracle hash-matches.
  */
object SparkEntry {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private val AsOf15 = "2024-01-15 00:00:00"
  private val Now31  = "2024-01-31 00:00:00"

  /** Flagship: point-in-time join on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    a3PitJoin(spark, "/root/testdata/sf0.001")

  // ======================================================================
  // A. point-in-time / temporal
  // ======================================================================

  /** A1 — single-key as-of lookup: latest value per feature for one entity. */
  private def a1AsOfLookup(s: SparkSession, dir: String): DataFrame =
    Latest
      .latestAgg(
        Tables.events(s, dir).where(col("user_id") === 7),
        keys = Seq("event_type"), tsCol = "ts", tieCol = "event_id",
        payloadCols = Seq("value"), asOf = Some(ts(AsOf15)))
      .orderBy("event_type")

  /** A2 — latest-per-(entity,feature) argmax over the whole log. */
  private def a2LatestPerKey(s: SparkSession, dir: String): DataFrame =
    Latest
      .latestAgg(
        Tables.events(s, dir),
        keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
        payloadCols = Seq("value"), asOf = Some(ts(AsOf15)))
      .orderBy("user_id", "event_type")

  /** A3 — the flagship point-in-time (as-of) join: each purchase enriched
    * with the user's latest click strictly at-or-before the purchase time.
    */
  private def a3PitJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val spine = ev
      .where(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val facts = ev
      .where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value").as("click_value"))
    AsOfJoin
      .locf(spine, facts, Seq("user_id"), "purchase_ts", "ts", Seq("click_value"), "event_id")
      .withColumnRenamed("ts__timestamp", "click_ts")
      .orderBy("purchase_id")
  }

  /** A4 — freshness classification histogram at a frozen `now`. */
  private def a4Freshness(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("freshness", Freshness.freshness(col("ts"), ts(Now31)))
      .groupBy("event_type", "freshness")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "freshness")

  /** A5 — as-of snapshot filter + aggregate. */
  private def a5SnapshotFilter(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("ts") <= ts(AsOf15))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")

  // ======================================================================
  // B. writes / ingest / upsert
  // ======================================================================

  /** B1 — validated append-only ingest (dry-run projection of valid rows). */
  private def b1ValidatedIngest(s: SparkSession, dir: String): DataFrame =
    Validation
      .validatedAppend(
        Tables.events(s, dir),
        typeCol = "event_type", valueCol = "value",
        activeTypes = Seq("click", "view", "purchase"),
        createdTs = ts("2024-02-01 00:00:00"))
      .orderBy("event_id")

  /** B2 — last-write-wins upsert: snapshot(<=Jan15) + updates(Jan15..] must
    * equal a full recompute of latest-per-key (idempotence oracle).
    */
  private def b2UpsertSnapshot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val base = Latest.latestAgg(
      ev.where(col("ts") <= ts(AsOf15)),
      keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
      payloadCols = Seq("value", "event_id"))
    val updates = ev.where(col("ts") > ts(AsOf15))
      .select("user_id", "event_type", "value", "event_id", "ts")
    Latest
      .lwwUpsert(base, updates, Seq("user_id", "event_type"), "ts", "event_id", Seq("value", "event_id"))
      .orderBy("user_id", "event_type")
  }

  /** B4 — referential-integrity anti-join: customers with no events. */
  private def b4OrphanCheck(s: SparkSession, dir: String): DataFrame =
    Validation
      .orphans(Tables.customer(s, dir), Tables.events(s, dir), "c_custkey", "user_id")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // ======================================================================
  // C. filters / projections
  // ======================================================================

  /** C1 — conjunctive metadata filter + projection + broadcast dim join. */
  private def c1FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000.0)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "c_acctbal", "n_name")
      .orderBy("c_custkey")

  /** C3 — projection to requested features with the explicit-null contract:
    * a requested-but-absent feature still yields a (null) row per entity.
    */
  private def c3ExplicitNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val requested = Seq("click", "refund").toDF("event_type")
    val users  = Tables.events(s, dir).select("user_id").distinct()
    val latest = Latest.latestAgg(
      Tables.events(s, dir),
      keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
      payloadCols = Seq("value"))
    users
      .crossJoin(broadcast(requested))
      .join(latest.withColumnRenamed("value", "v"), Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"), col("v").as("value"))
      .orderBy("user_id", "event_type")
  }

  // ======================================================================
  // D. RBAC
  // ======================================================================

  /** D1+D2 — PHI masking: 'error' events are PHI-direct readable only by
    * phi_reader; the querying user has roles [analyst, ml_engineer] so the
    * value column is masked to null, counted per type.
    */
  private def d2MaskPhi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("phi_level", when(col("event_type") === "error", "direct").otherwise("none"))
      .withColumn("access_roles",
        when(col("event_type") === "error", array(lit("phi_reader"))).otherwise(array(lit("analyst"))))
    ev.withColumn("masked",
        Rbac.mask(col("value"), col("phi_level"), col("access_roles"), Seq("analyst", "ml_engineer")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("masked")).as("n_visible"))
      .orderBy("event_type")
  }

  // ======================================================================
  // E. aggregations / metrics
  // ======================================================================

  /** E2+E3 — avg + exact p99 latency-style metrics per group. */
  private def e23Quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** E4 — counters + conditional counts + ratio (hit-rate pattern). */
  private def e4Counters(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count_if(col("event_type") === "error").as("n_errors"),
        round(count_if(col("event_type") === "error") / count(lit(1)).cast("double"), 4).as("error_rate"))
      .orderBy("user_id")

  /** E6 — EAV -> wide feature-vector pivot (bounded by explicit names). */
  private def e6PivotVector(s: SparkSession, dir: String): DataFrame =
    PivotVector
      .toVector(
        Tables.events(s, dir),
        entityCol = "user_id", nameCol = "event_type", valueCol = "value",
        tsCol = "ts", tieCol = "event_id",
        names = Seq("click", "view", "purchase", "signup", "error"))
      .orderBy("user_id")

  // ======================================================================
  // F. scalar surface
  // ======================================================================

  /** F2 — deterministic sha256-based id generation. */
  private def f2IdGen(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        Fns.featureId(col("p_name"), col("p_brand"), col("p_type")).as("feature_id"))
      .orderBy("p_partkey")

  // ======================================================================
  // headline relational aggregate (bench anchor)
  // ======================================================================

  /** Q1-style wide aggregate over lineitem (scan + partial agg + shuffle). */
  private def q1LineitemAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ======================================================================
  // contract maps
  // ======================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_asof_lookup"     -> (a1AsOfLookup _),
    "a2_latest_per_key"  -> (a2LatestPerKey _),
    "a3_pit_join"        -> (a3PitJoin _),
    "a4_freshness"       -> (a4Freshness _),
    "a5_snapshot_filter" -> (a5SnapshotFilter _),
    "b1_validated_ingest" -> (b1ValidatedIngest _),
    "b2_upsert_snapshot" -> (b2UpsertSnapshot _),
    "b4_orphan_check"    -> (b4OrphanCheck _),
    "c1_filter_project"  -> (c1FilterProject _),
    "c3_explicit_nulls"  -> (c3ExplicitNulls _),
    "d2_mask_phi"        -> (d2MaskPhi _),
    "e23_quantiles"      -> (e23Quantiles _),
    "e4_counters"        -> (e4Counters _),
    "e6_pivot_vector"    -> (e6PivotVector _),
    "f2_idgen"           -> (f2IdGen _),
    "q1_lineitem_agg"    -> (q1LineitemAgg _)
  )

  def oracleSql: Map[String, String] = Map(
    "a1_asof_lookup" ->
      """SELECT event_type, arg_max(value, ts) AS value, max(ts) AS ts
        |FROM events WHERE user_id = 7 AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a2_latest_per_key" ->
      """SELECT user_id, event_type, arg_max(value, ts) AS value, max(ts) AS ts
        |FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "a3_pit_join" ->
      """WITH spine AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |facts AS (
        |  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT s.user_id, s.purchase_id, s.purchase_ts, s.purchase_value,
        |         f.value AS click_value, f.ts AS click_ts,
        |         row_number() OVER (PARTITION BY s.purchase_id ORDER BY f.ts DESC, f.event_id DESC) AS rn
        |  FROM spine s LEFT JOIN facts f ON f.user_id = s.user_id AND f.ts <= s.purchase_ts)
        |SELECT user_id, purchase_id, purchase_ts, purchase_value, click_value, click_ts
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,
    "a4_freshness" ->
      """SELECT event_type,
        |  CASE WHEN date_diff('second', ts, TIMESTAMP '2024-01-31 00:00:00') <= 3600 THEN 'fresh'
        |       WHEN date_diff('second', ts, TIMESTAMP '2024-01-31 00:00:00') <= 86400 THEN 'stale'
        |       ELSE 'expired' END AS freshness,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a5_snapshot_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "b1_validated_ingest" ->
      """SELECT event_id, ts, user_id, event_type, value, props,
        |       TIMESTAMP '2024-02-01 00:00:00' AS created_timestamp
        |FROM events
        |WHERE event_type IN ('click', 'view', 'purchase') AND value IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "b2_upsert_snapshot" ->
      """SELECT user_id, event_type, arg_max(value, ts) AS value,
        |       arg_max(event_id, ts) AS event_id, max(ts) AS ts
        |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "b4_orphan_check" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "c1_filter_project" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin,
    "c3_explicit_nulls" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |req(event_type) AS (VALUES ('click'), ('refund')),
        |latest AS (SELECT user_id, event_type, arg_max(value, ts) AS value
        |           FROM events GROUP BY user_id, event_type)
        |SELECT u.user_id, r.event_type, l.value
        |FROM users u CROSS JOIN req r
        |LEFT JOIN latest l ON l.user_id = u.user_id AND l.event_type = r.event_type
        |ORDER BY u.user_id, r.event_type""".stripMargin,
    "d2_mask_phi" ->
      """SELECT event_type, count(*) AS n,
        |       count(CASE WHEN event_type = 'error' THEN NULL ELSE value END) AS n_visible
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e23_quantiles" ->
      """SELECT l_returnflag, round(avg(l_extendedprice), 2) AS avg_price,
        |       round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "e4_counters" ->
      """SELECT user_id, count(*) AS n_events,
        |       count(*) FILTER (event_type = 'error') AS n_errors,
        |       round(count(*) FILTER (event_type = 'error') / count(*)::DOUBLE, 4) AS error_rate
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e6_pivot_vector" ->
      """WITH latest AS (SELECT user_id, event_type, arg_max(value, ts) AS value
        |                FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  max(CASE WHEN event_type = 'click' THEN value END) AS click,
        |  max(CASE WHEN event_type = 'view' THEN value END) AS "view",
        |  max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
        |  max(CASE WHEN event_type = 'signup' THEN value END) AS signup,
        |  max(CASE WHEN event_type = 'error' THEN value END) AS error
        |FROM latest GROUP BY user_id ORDER BY user_id""".stripMargin,
    "f2_idgen" ->
      """SELECT p_partkey,
        |       'feat_' || substr(sha256(p_name || ':' || p_brand || ':' || p_type), 1, 16) AS feature_id
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
