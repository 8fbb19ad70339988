package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Dev harness: as-of join formulations at synthetic scale (deterministic,
  * generated via spark.range — no testdata dependency).
  * Usage: runMain graft.ScaleProbe [nFacts] [nSpine] [nKeys]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nFacts = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nSpine = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val nKeys  = args.lift(2).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def facts = spark.range(nFacts).select(
      (col("id") % nKeys).as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id")), lit(30000000L))).as("fts"),
      col("id").as("tie"),
      (col("id") % 1000).cast("double").as("v"))
    def spine = spark.range(nSpine).select(
      (col("id") % (nKeys * 2)).as("k"), // half the spine keys have no facts
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id"), lit(7)), lit(30000000L))).as("sts"),
      col("id").as("tag"))

    // checksum over every output column so nothing can be pruned away —
    // a bare count() lets Catalyst drop the window/payload entirely
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.2fs  checksum=$n")
    }

    time("locf")   { checksum(AsOfJoin.locf(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")) }
    time("native") { checksum(AsOfJoin.native(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")) }
    time("locf2")  { checksum(AsOfJoin.locf(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")) }
    time("native2"){ checksum(AsOfJoin.native(spine, facts, Seq("k"), "sts", "fts", Seq("v"), "tie")) }
    spark.stop()
  }
}
