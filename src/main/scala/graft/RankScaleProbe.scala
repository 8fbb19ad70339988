package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the distributed global rank / NTILE path: the
  * prefix-sum formulation must stay parallel at data sizes where a naive
  * `ntile().over(Window.orderBy(...))` collapses into one task. Run:
  * `runMain graft.RankScaleProbe [nRows]`.
  */
object RankScaleProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // decorrelated sort key so range partitioning actually redistributes
    val df = spark.range(0L, nRows).select(
      col("id"),
      ((col("id") * 2654435761L) % nRows).as("v"))

    var t0 = System.nanoTime()
    val deciles = graft.operators.Rank
      .withNtile(df, Seq(col("v"), col("id")), 10, "decile")
      .groupBy("decile").agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("decile")
      .collect()
    val ntileSec = (System.nanoTime() - t0) / 1e9

    // invariants at scale: exact partition into 10 buckets, sizes within 1,
    // contiguous non-overlapping value ranges
    val sizes = deciles.map(_.getLong(1))
    assert(sizes.sum == nRows, s"ntile dropped rows: ${sizes.sum} != $nRows")
    assert(sizes.max - sizes.min <= 1, s"bucket sizes differ by > 1: ${sizes.toSeq}")
    val ranges = deciles.map(r => (r.getLong(2), r.getLong(3)))
    assert(ranges.zip(ranges.tail).forall { case ((_, hi), (lo, _)) => hi < lo },
      s"decile ranges overlap: ${ranges.toSeq}")

    // the rank itself: dense 1..n (checked cheaply via min/max/count/sum)
    t0 = System.nanoTime()
    val stats = graft.operators.Rank
      .withGlobalRank(df, Seq(col("v"), col("id")), "r")
      .agg(min("r"), max("r"), count(lit(1)),
        sum(col("r") % 1000000L)) // mod keeps the checksum overflow-free under ANSI
      .collect().head
    val rankSec = (System.nanoTime() - t0) / 1e9
    assert(stats.getLong(0) == 1L && stats.getLong(1) == nRows && stats.getLong(2) == nRows)

    println(f"[rank-probe] rows=$nRows%d ntile10=$ntileSec%.1fs globalRank=$rankSec%.1fs " +
      f"sizes=[${sizes.min}%d..${sizes.max}%d]")
    spark.stop()
  }
}
