package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Freshness classification (reference: _calculate_freshness,
  * /root/reference/src/serving/feature_server.py:585-594; thresholds from
  * ServingConfig :107-108; missing value -> EXPIRED :575-581).
  *
  * age = now - ts (seconds); age <= slaSec -> "fresh";
  * age <= staleSec -> "stale"; else (or null ts) -> "expired".
  *
  * `now` is an explicit Column (never current_timestamp()) so results are
  * deterministic and oracle-checkable — SURVEY.md §5.4.
  */
object Freshness {
  val FreshSlaSec: Long  = 3600L  // feature_server.py:107
  val StaleThreshSec: Long = 86400L // feature_server.py:108

  def ageSec(ts: Column, now: Column): Column =
    unix_timestamp(now) - unix_timestamp(ts)

  def freshness(
      ts: Column,
      now: Column,
      slaSec: Long = FreshSlaSec,
      staleSec: Long = StaleThreshSec
  ): Column = {
    val age = ageSec(ts, now)
    when(ts.isNull, lit("expired"))
      .when(age <= slaSec, lit("fresh"))
      .when(age <= staleSec, lit("stale"))
      .otherwise(lit("expired"))
  }
}
