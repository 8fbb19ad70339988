package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns.epsRound

/** Gap-based sessionization — the canonical event-log feature-engineering
  * op (a new session starts when the gap to the previous event exceeds
  * `gapSec`). Two windows over one shuffle partition set: lag() to flag
  * session starts, running sum to number them — Catalyst plans both over a
  * single sort of the same (key, ts) ordering, so the whole operator is one
  * exchange + one sort regardless of data size.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key) to every event row. Ordering ties
    * broken by `tieCol` (same pinned total order as the as-of operators).
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, gapSec: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(order)
    // EXACT gap arithmetic (cast to double seconds, fraction included):
    // unix_timestamp truncates to whole seconds, so two events 1.999s
    // apart read as gap=1 and merged while 1.001s apart read as gap=2 and
    // split — misclassification around every second boundary for
    // sub-second event times. The oracle replays epoch() - epoch(), the
    // same exact arithmetic.
    val newSession = when(
      prevTs.isNull || (col(tsCol).cast("double") - prevTs.cast("double")) > gapSec, 1
    ).otherwise(0)
    df.withColumn("session_idx", sum(newSession).over(running))
  }

  /** Session-level rollup: bounds, event count, value sum per session. */
  def stats(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, valueCol: String, gapSec: Long): DataFrame =
    assign(df, keyCol, tsCol, tieCol, gapSec)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        epsRound(sum(col(valueCol)), 2).as("sum_value"))
}
