package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the append-only event log — the behavioral
  * read side of a feature platform (the reference's event-shaped fact rows,
  * feature_registry.py:181-198, are exactly this log; these operators are
  * the queries a growth/DS team runs on it and the aggregate features a
  * training pipeline derives from it).
  *
  * Scale shape: every operator here is groupBy(entity) + window-within-
  * partition — ONE shuffle on the entity key, no self-joins, no driver
  * round-trips. At 100 TB the event log is date-partitioned and bucketed by
  * entity (sources/Lakehouse), so even that shuffle collapses to a local
  * sort when reading the bucketed layout.
  */
object Behavior {

  /** Ordered-funnel progression: for each entity, the anchor time of each
    * stage prefix it completed IN ORDER — `first_0 = min(ts of stage-0
    * events)`, `first_k = min(ts of stage-k events at-or-after
    * first_{k-1})` (ties at the same timestamp count as progression). This
    * is the standard sequential funnel: an entity that clicked only BEFORE
    * ever viewing did not convert view→click, even though both event types
    * exist.
    *
    * Shape: one conditional-min aggregation per stage, each a groupBy on
    * the entity key. After the first aggregation the frame is one row per
    * entity; the k-1 follow-up joins are entity-key equi-joins against the
    * (filtered) event log, so every shuffle is on the same key and AQE
    * reuses the partitioning. No window, no explode, no driver round-trip.
    * Returns one row per stage-0 entity with `first_<i>` anchor timestamps
    * (null once the entity falls out) and `depth` = stages completed.
    */
  def funnelDepth(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(entityCol).as("__e"), col(tsCol).as("__ts"), col(typeCol).as("__t"))
    val base = ev.where(col("__t") === stages.head)
      .groupBy("__e").agg(min(col("__ts")).as("first_0"))
    val full = stages.zipWithIndex.drop(1).foldLeft(base) { case (acc, (stage, i)) =>
      val prev = s"first_${i - 1}"
      val carried = acc.columns.filterNot(_ == "__e").map(c => first(col(c)).as(c))
      acc.join(ev.where(col("__t") === stage), Seq("__e"), "left")
        .groupBy("__e")
        .agg(
          carried.head, (carried.tail :+
            min(when(col("__ts") >= col(prev), col("__ts"))).as(s"first_$i")): _*)
    }
    val depth = stages.indices.drop(1).foldLeft(
      when(col("first_0").isNotNull, lit(1)).otherwise(lit(0))) { (acc, i) =>
      when(acc === i && col(s"first_$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    full.withColumnRenamed("__e", entityCol).withColumn("depth", depth)
  }

  /** Funnel conversion table: entities at each depth (1-based stage index,
    * depth 0 = entered no stage) with the conversion ratio vs stage 1. */
  def funnel(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    val d = funnelDepth(events, entityCol, tsCol, typeCol, stages)
    // entities at depth >= k, for each k — all k counts land in ONE agg
    // row, so the conversion ratio is a plain per-row expression (no
    // global window, which the plan audit rightly bans)
    // coalesce: SUM over an EMPTY depth frame (no stage-0 entities at
    // all) is SQL-null, and a conversion report must read 0, not null
    val counts = stages.indices.map(i =>
      coalesce(sum(when(col("depth") >= i + 1, 1L).otherwise(0L)), lit(0L)).as(s"__c$i"))
    val agg = d.agg(counts.head, counts.tail: _*)
    agg.select(
      explode(array(stages.zipWithIndex.map { case (s0, i) =>
        struct(
          lit(i + 1).as("stage_idx"),
          lit(s0).as("stage"),
          col(s"__c$i").as("n_entities"),
          graft.functions.Fns.epsRound(
            col(s"__c$i").cast("double") / col("__c0"), 4).as("pct_of_first"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Cohort retention: bucket each entity by the period of its FIRST event
    * (the cohort), then count distinct entities active at each period
    * offset. `periodExpr` maps a timestamp column to a period index (e.g.
    * days or weeks since epoch). Two shuffles total: first-event argmin per
    * entity, then the (cohort, offset) count — both on keys that grow with
    * entities, never with raw events.
    */
  def cohortRetention(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      periodExpr: Column => Column): DataFrame = {
    val withPeriod = events.select(
      col(entityCol).as("__e"), periodExpr(col(tsCol)).as("__p"))
    val firstPeriod = withPeriod.groupBy("__e").agg(min("__p").as("__cohort"))
    withPeriod
      .join(firstPeriod, "__e") // co-partitioned on __e: AQE keeps this local after the agg
      .groupBy(col("__cohort").as("cohort"), (col("__p") - col("__cohort")).as("offset"))
      .agg(countDistinct(col("__e")).as("n_active"))
  }

  /** OHLC bar downsampling: per (entity, time bucket), the first / max /
    * min / last observed value plus count and mean — the canonical way an
    * irregular numeric signal (vitals, prices, sensor readings) is
    * compressed into fixed-cadence features without losing the extremes a
    * plain avg() erases. `orderCols` breaks same-timestamp ties so "first"
    * and "last" are deterministic (min_by/max_by over the lexicographic
    * struct ordering).
    *
    * Single hash-aggregate on (entity, bucket) — min_by/max_by are
    * algebraic, so the partial agg combines map-side; no window over raw
    * rows, no self-join. The 100 TB event log downsamples in one shuffle
    * whose output is bars, not events.
    */
  def ohlc(
      obs: DataFrame,
      entityCol: String,
      bucketCol: Column,
      valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "ohlc needs at least one ordering column")
    obs
      .where(col(valueCol).isNotNull)
      .groupBy(col(entityCol), bucketCol.as("bucket"))
      .agg(
        min_by(col(valueCol), struct(orderCols.map(col): _*)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(orderCols.map(col): _*)).as("close"),
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("mean"))
  }

  /** First-order transition matrix over the event-type sequence: for each
    * entity's time-ordered stream, count (previous type → type) steps and
    * the conditional probability of each step given the previous type —
    * the Markov-chain summary behind next-action features and
    * anomalous-session scoring. An entity's first event has no
    * predecessor and contributes no step.
    *
    * One shuffle on the entity key for the lag window (partition-local
    * sort), then a hash-aggregate on the (prev, next) pair — 25 cells for
    * a 5-type log regardless of data size. The probability normalizer is
    * a second tiny aggregate joined back on `prev` (rows ∝ types², so the
    * join is a broadcast).
    */
  def transitions(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "transitions needs at least one ordering column")
    val w = Window.partitionBy(entityCol).orderBy(orderCols.map(col): _*)
    val steps = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("prev_type").agg(sum("n").as("__tot"))
    steps.join(broadcast(totals), "prev_type")
      .withColumn("p", col("n").cast("double") / col("__tot"))
      .drop("__tot")
  }

  /** Rolling distinct-actives (the DAU/WAU shape): per calendar day, the
    * count of distinct entities active that day AND over the trailing
    * `windowDays`-day window ending that day. Rolling COUNT DISTINCT is
    * not a windowable aggregate — the scalable formulation dedups to the
    * (entity, day) grain first, then EXPLODES each active day into the
    * `windowDays` window-end days it contributes to (map-side ×w fan-out
    * of a day-grain frame, not the raw log), and re-counts distinct per
    * window end. Shuffles touch entity×day and day-grain frames only; the
    * raw event log is scanned once. Days with no activity in the window
    * produce no row (observable grid = days that had any activity).
    */
  def rollingActives(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val grain = events
      .select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val daily = grain.groupBy(col("__d").as("day"))
      .agg(countDistinct(col("__e")).as("n_active"))
    val rolling = grain
      .select(col("__e"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("day"))
      .groupBy("day")
      .agg(countDistinct(col("__e")).as("n_active_window"))
    // inner join: report only days that themselves saw activity (the
    // explode also manufactures window-end days past the data's horizon)
    daily.join(rolling, "day")
  }

  /** Time-weighted average of a measure per entity over an observation
    * window [start, end): each observed value holds (LOCF) until the next
    * observation, and the average weights each value by its holding
    * duration. The standard way to turn an irregularly-sampled signal
    * (vitals, prices, telemetry) into one unbiased scalar feature — a plain
    * avg() over-weights densely-sampled episodes.
    *
    * Window-function shape: lead(ts) within entity gives each row its
    * holding interval, clamped to `end`; rows before an entity's first
    * observation contribute nothing (there is no value to hold). One
    * shuffle on the entity key.
    */
  def timeWeightedAvg(
      obs: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String,
      startTs: Column,
      endTs: Column): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsCol)
    obs
      // null observations carry no value to hold: dropping them BEFORE the
      // lead() extends the previous value's holding interval across the
      // null's span (LOCF), instead of adding duration to the denominator
      // with nothing in the numerator (a silently deflated average)
      .where(col(valueCol).isNotNull)
      .where(col(tsCol) >= startTs && col(tsCol) < endTs)
      .withColumn("__next", coalesce(lead(col(tsCol), 1).over(w), endTs))
      .withColumn("__dur",
        col("__next").cast("double") - col(tsCol).cast("double"))
      .groupBy(entityCol)
      .agg(
        (sum(col(valueCol) * col("__dur")) / sum(col("__dur"))).as("twavg"),
        count(lit(1)).as("n_obs"))
  }

  /** Trailing event-sequence feature: for every event, the previous `n`
    * values of `seqCol` for the same entity in event order, OLDEST FIRST,
    * joined with `sep` — the "last-N actions" context feature every
    * sequential recommender / churn model consumes at serving time. The
    * current event is excluded (it is the prediction target's context,
    * not part of it); an entity's first event gets the empty string, and
    * null sequence values are skipped (they carry no action).
    *
    * Scale shape: ONE bounded partitioned window per entity (rows
    * between −n and −1) + a map-only join of the collected array —
    * parallelism is the entity count, no partition is corpus-sized, no
    * unpartitioned window (the PlanAuditSpec ban).
    */
  def trailingEvents(df: DataFrame, entityCol: String, orderCols: Seq[String],
      seqCol: String, n: Int, outCol: String = "prev_events",
      sep: String = "|"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = Window.partitionBy(entityCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(-n, -1)
    df.withColumn(outCol,
      concat_ws(sep, collect_list(col(seqCol)).over(w)))
  }
}
