package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the event-sequence family: sequential funnel, cohort
  * retention, and time-weighted average over a synthetic 20M-row event log
  * (1M entities), local[4]. Asserts the invariants that must hold at any
  * size: funnel stage counts are monotone non-increasing, every cohort's
  * offset-0 count equals its cohort size, and each entity's time-weighted
  * average lies within the value range. Run:
  * `runMain graft.BehaviorScaleProbe [nEvents] [nUsers]`.
  */
object BehaviorScaleProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nUsers = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic log: user, event-type drawn from the id hash,
    // ts spread over 60 days from 2024-01-01 (epoch 1704067200), value in [0, 100)
    val base = lit("2024-01-01 00:00:00").cast("timestamp")
    val ev = spark.range(nEvents).select(
      pmod(xxhash64(col("id")), lit(nUsers)).as("user_id"),
      element_at(
        array(lit("view"), lit("view"), lit("click"), lit("purchase"), lit("error")),
        (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")).as("event_type"),
      timestamp_seconds(lit(1704067200L) +
        pmod(xxhash64(col("id"), lit(2)), lit(5184000L))).as("ts"),
      (pmod(xxhash64(col("id"), lit(3)), lit(10000L)).cast("double") / 100.0).as("value"))
      .cache()
    ev.count() // materialize so each operator is timed alone

    var t0 = System.nanoTime()
    val funnel = operators.Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    val funnelSec = (System.nanoTime() - t0) / 1e9
    val counts = funnel.sortBy(_.getInt(0)).map(_.getLong(2))
    require(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel counts must be monotone non-increasing: ${counts.mkString(",")}")

    t0 = System.nanoTime()
    val cohort = operators.Behavior.cohortRetention(ev, "user_id", "ts",
      t => floor(datediff(to_date(t), lit("2024-01-01").cast("date")) / 7)).cache()
    val nCohortRows = cohort.count()
    val cohortSec = (System.nanoTime() - t0) / 1e9
    // offset 0 is each cohort's size: no offset row can exceed it
    val bad = cohort.as("c")
      .join(cohort.where(col("offset") === 0)
        .select(col("cohort"), col("n_active").as("c0")), Seq("cohort"))
      .where(col("n_active") > col("c0")).count()
    require(bad == 0, s"$bad cohort rows exceed their offset-0 size")

    t0 = System.nanoTime()
    val tw = operators.Behavior.timeWeightedAvg(ev, "user_id", "ts", "value",
      base, base + expr("interval 60 days")).cache()
    val nTw = tw.count()
    val twSec = (System.nanoTime() - t0) / 1e9
    require(tw.where(col("twavg") < 0.0 || col("twavg") >= 100.0).isEmpty,
      "time-weighted average escaped the value range")

    println(f"[behavior-probe] $nEvents%d events / $nUsers%d users: " +
      f"funnel $funnelSec%.1f s (stages ${counts.mkString("/")}), " +
      f"cohort $cohortSec%.1f s ($nCohortRows rows), " +
      f"twavg $twSec%.1f s ($nTw entities)")
    spark.stop()
  }
}
