package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join — the operator Spark lacks for a PURE non-equi
  * `point BETWEEN lo AND hi` join (no equality key): Catalyst can only
  * plan a broadcast-nested-loop or cartesian for it, both scale-killers.
  * The standard fix (the published range-join bucketing optimization):
  * pick a bucket width w, explode each range over the fixed-width buckets
  * it overlaps, map each point to its single containing bucket, hash
  * equi-join on the bucket id, and re-apply the exact range predicate as a
  * residual filter.
  *
  * Cost model: ranges replicate by ceil(span/w)+1, points never replicate —
  * so the shuffle is one pass over points plus a bounded blow-up of ranges;
  * with w on the order of the median range span the blow-up is ~2×. Each
  * (point, range) pair surfaces EXACTLY once (a point lives in exactly one
  * bucket), so no dedup pass is needed. Works at any scale where the
  * exploded ranges fit a shuffle — i.e. everywhere the nested loop does
  * not.
  */
object RangeJoin {

  /** Join `points` to every row of `ranges` whose [loCol, hiCol] interval
    * (inclusive both ends) contains pointCol. Output = point columns +
    * range columns. Column name collisions are the caller's to avoid. */
  def pointInRange(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    // inverted ranges (lo > hi) denote the EMPTY interval and must be
    // dropped BEFORE the explode: sequence(start, stop) silently generates
    // a DESCENDING range when start > stop, so one corrupt row would
    // explode into up to billions of bucket rows that the residual filter
    // then discards (the straggler/OOM shape, for zero output)
    val r = ranges.where(col(loCol) <= col(hiCol)).withColumn("__b",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    p.join(r, Seq("__b"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
