package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking and equi-depth bucketing.
  *
  * Spark's own `ntile(k).over(Window.orderBy(...))` with no partition key
  * collapses the whole table into ONE task — the canonical scale trap for
  * "global percentile/decile" jobs. This module computes a total-order rank
  * the way a 1000-executor engine has to: range-repartition on the sort key,
  * per-partition counts to the driver (one long per partition, never data
  * rows), prefix-sum offsets broadcast back, and an intra-partition
  * `row_number` keyed by partition id so every partition ranks
  * independently. Same two-pass shape as
  * [[TextAnalysis.packSequences]]'s token prefix sum.
  */
object Rank {

  /** Append a 1-based global rank under the total order defined by
    * `sortCols` (callers must pass a tie-free key — append a unique id
    * column if the natural key has duplicates; otherwise ranks are
    * assigned arbitrarily within ties and results are not reproducible).
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val arranged = df
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // pin the partition assignment: the count pass and the rank pass must
      // see the SAME __pid per row (range partitioning samples its bounds,
      // so a recompute is not guaranteed identical)
      .localCheckpoint()

    val counts = arranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { pid =>
        val off = acc; acc += counts(pid); pid -> off
      }.toMap
    }

    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    arranged
      .withColumn(rankCol,
        row_number().over(w).cast("long") + element_at(typedlit(offsets), col("__pid")))
      .drop("__pid")
  }

  /** Append SQL-`NTILE(k)` bucket numbers (1-based) under the total order
    * `sortCols` — the first `n % k` buckets hold `n div k + 1` rows, the
    * rest `n div k`, exactly the ANSI boundary rule, so a DuckDB
    * `ntile(k) OVER (ORDER BY ...)` oracle reproduces it bit-for-bit.
    * Distributed via [[withGlobalRank]]; the row count joins in as a
    * broadcast 1-row frame (no driver-side count action on the data path).
    */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int, outCol: String,
      rankCol: String = "__rank"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val ranked = withGlobalRank(df, sortCols, rankCol)
    val nDf = ranked.agg(count(lit(1)).as("__n"))
    ranked
      .crossJoin(broadcast(nDf))
      // integer `div` throughout (never floor(a/b): double division rounds
      // above 2^53). The ELSE's divisor `__n div k` is only 0 when n < k,
      // and then every rank satisfies the THEN branch, so CASE's per-row
      // short-circuit keeps the division unevaluated.
      .withColumn(outCol, expr(
        s"""CASE WHEN ($rankCol - 1L) < (__n % ${k}L) * (__n div ${k}L + 1L)
           |     THEN ($rankCol - 1L) div (__n div ${k}L + 1L) + 1L
           |     ELSE (__n % ${k}L) +
           |          (($rankCol - 1L) - (__n % ${k}L) * (__n div ${k}L + 1L)) div (__n div ${k}L) + 1L
           |END""".stripMargin))
      .drop("__n")
  }
}
