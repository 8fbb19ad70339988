package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the bucketized range join: points × ranges at a size
  * where the naive plan is IMPOSSIBLE (5M points × 100k ranges = 5·10^11
  * nested-loop comparisons), the bucketized plan is a single hash
  * equi-join whose shuffle is points + ~2× ranges. Asserts the result on
  * a verifiable slice (points in exactly-covering ranges) and that the
  * executed plan carries no nested loop. Run:
  * `runMain graft.RangeJoinScaleProbe [nPoints] [nRanges]`.
  */
object RangeJoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nRanges = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ranges tile [0, nRanges*10) in width-25 intervals every 10 units →
    // every point at coordinate x falls in 2-3 ranges (overlap factor ~2.5)
    val ranges = spark.range(nRanges).select(
      col("id").as("rid"),
      (col("id") * 10.0).as("lo"),
      (col("id") * 10.0 + 25.0).as("hi"))
    val span = nRanges * 10.0
    val points = spark.range(nPoints).select(
      col("id").as("pid"),
      (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1e6 * span).as("p"))

    val joined = graft.operators.RangeJoin.pointInRange(points, "p", ranges, "lo", "hi",
      bucketWidth = 25.0)
    val plan = joined.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"probe must plan an equi-join:\n$plan")

    val t0 = System.nanoTime()
    val nPairs = joined.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // every pair count must equal the closed form per point: a point at x
    // falls in ranges rid ∈ (x/10 - 2.5, x/10], i.e. 2 or 3 ranges away
    // from the tiling edges — verify the AGGREGATE against an exact
    // per-point computation on a 1k sample
    val sample = joined.groupBy("pid").count()
      .join(points.sample(0.0002, seed = 7), "pid")
      .collect()
    sample.foreach { r =>
      val x = r.getDouble(2)
      val expected = (0L to (x / 10.0).toLong)
        .count(i => x >= i * 10.0 && x <= i * 10.0 + 25.0 && i < nRanges)
      require(r.getLong(1) == expected, s"point $x: got ${r.getLong(1)}, want $expected")
    }

    println(f"[range-probe] $nPoints%d points x $nRanges%d ranges -> $nPairs%d pairs " +
      f"in $sec%.1f s (${nPoints / sec / 1e6}%.2f M points/s); " +
      f"naive would be ${nPoints * nRanges / 1e12}%.1f trillion comparisons; " +
      f"sample of ${sample.length} points verified against the closed form")
    spark.stop()
  }
}
