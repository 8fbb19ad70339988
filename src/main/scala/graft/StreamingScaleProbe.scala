package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the streaming state family: the keyed LWW online
  * store (flatMapGroupsWithState) fed 1M synthetic events over 100k keys in
  * FOUR micro-batches, then checked for EXACT equality against the batch
  * arg_max recompute over the same rows — the cross-batch state contract at
  * a size where any per-key leak or tie-rule drift would surface. Also
  * times the watermarked tumbling-window aggregate over the same stream.
  * State shards stay at 8: what scales state in production is shard count ×
  * store size, and the probe's per-shard volume (125k rows) is the shape
  * each executor would see under a 1000-shard cluster layout. Run:
  * `runMain graft.StreamingScaleProbe [nEvents] [nKeys]`.
  */
object StreamingScaleProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nKeys = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // deterministic synthetic stream: ~10 events per (user, feature) key
    // with hash-scattered timestamps so later batches REWRITE earlier
    // batches' keys (the state-update path, not just inserts)
    val rows = spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1704067200L) + pmod(xxhash64(col("id")), lit(864000L))).as("ts"),
      pmod(xxhash64(col("id"), lit(1)), lit(nKeys)).as("user_id"),
      concat(lit("f"), pmod(xxhash64(col("id"), lit(2)), lit(5))).as("event_type"),
      (pmod(xxhash64(col("id"), lit(3)), lit(10000L)).cast("double") / 100.0).as("value"))
      .as[Streaming.EventRow].collect()
    println(s"generated ${rows.length} events over <= $nKeys keys x 5 features")

    val quarters = rows.grouped(math.max(1, rows.length / 4 + 1)).toSeq
    val ms = MemoryStream[Streaming.EventRow]
    var t0 = System.nanoTime()
    val q = Streaming.latestStateStream(ms.toDS())
      .writeStream.format("memory").queryName("probe_lww")
      .outputMode("update").start()
    quarters.foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val lwwSec = (System.nanoTime() - t0) / 1e9

    // exact equality vs the batch recompute: latest update per key == state
    val streamed = operators.Latest.latestAgg(
      spark.table("probe_lww"),
      keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
      payloadCols = Seq("value", "event_id"))
      .select("user_id", "event_type", "value", "event_id")
    val batch = operators.Latest.latestAgg(
      rows.toSeq.toDF(),
      keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
      payloadCols = Seq("value", "event_id"))
      .select("user_id", "event_type", "value", "event_id")
    val nKeysOut = streamed.count()
    val nDiff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    require(nDiff == 0L, s"streamed LWW state diverged from batch argmax on $nDiff rows")
    println(f"lww: ${rows.length} events -> $nKeysOut keys in 4 micro-batches, $lwwSec%.1f s, exact match")

    // watermarked tumbling-window aggregate over the same four batches
    val ms2 = MemoryStream[Streaming.EventRow]
    t0 = System.nanoTime()
    val q2 = Streaming.windowedCounts(ms2.toDF(), "1 hour")
      .writeStream.format("memory").queryName("probe_window")
      .outputMode("update").start()
    // event-time order so nothing is late
    rows.sortBy(e => (e.ts.getTime, e.event_id))
      .grouped(math.max(1, rows.length / 4 + 1))
      .foreach { b => ms2.addData(b.toSeq); q2.processAllAvailable() }
    q2.stop()
    val winSec = (System.nanoTime() - t0) / 1e9
    val nWin = spark.table("probe_window")
      .groupBy("window_start", "event_type").agg(max("n")).count()
    val nWinBatch = rows.toSeq.toDF()
      .groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count()
    require(nWin == nWinBatch, s"window count $nWin != batch $nWinBatch")
    println(f"window: $nWin windows in $winSec%.1f s, cardinality matches batch")

    spark.stop()
  }
}
