package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

import graft.streaming.Streaming
import graft.streaming.Streaming.EventRow

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkStream(rows: Seq[EventRow]): MemoryStream[EventRow] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventRow]
    ms.addData(rows)
    ms
  }

  private val batch = Seq(
    EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
    EventRow(2L, ts("2024-01-01 10:30:00"), 1L, "click", 2.0),
    EventRow(3L, ts("2024-01-01 11:15:00"), 2L, "view", 3.0),
    EventRow(2L, ts("2024-01-01 10:30:00"), 1L, "click", 2.0), // dup event_id
    EventRow(4L, ts("2024-01-01 10:45:00"), 1L, "bogus", 4.0)  // inactive type
  )

  test("validatedIngest filters inactive types on a stream") {
    val ms = mkStream(batch)
    val out = Streaming.runToMemory(
      spark,
      Streaming.validatedIngest(ms.toDF(), Seq("click", "view")),
      "t_valid", OutputMode.Append())
    assert(out.count() == 4) // bogus dropped, dup retained (validation only)
    assert(out.where($"event_type" === "bogus").isEmpty)
  }

  test("windowedCounts aggregates per tumbling window in update mode") {
    val ms = mkStream(batch.take(3))
    val out = Streaming.runToMemory(
      spark,
      Streaming.windowedCounts(ms.toDF(), "1 hour"),
      "t_win", OutputMode.Update())
    val m = out.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m((ts("2024-01-01 10:00:00"), "click")) == 2L)
    assert(m((ts("2024-01-01 11:00:00"), "view")) == 1L)
  }

  test("dedupedStream drops duplicate event ids within the watermark") {
    val ms = mkStream(batch)
    val out = Streaming.runToMemory(
      spark, Streaming.dedupedStream(ms.toDF()), "t_dedup", OutputMode.Append())
    assert(out.count() == 4) // 5 rows - 1 dup
    assert(out.where($"event_id" === 2L).count() == 1)
  }

  test("session_window streaming aggregation groups by activity gaps") {
    val ms = mkStream(Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0), // same session (<30m gap)
      EventRow(3L, ts("2024-01-01 12:00:00"), 1L, "click", 3.0), // new session
      EventRow(4L, ts("2024-01-02 00:00:00"), 9L, "click", 0.0)  // advances watermark
    ))
    // session windows finalize only in append mode once the watermark passes
    val out = Streaming.runToMemory(
      spark,
      ms.toDF()
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n")),
      "t_sess", OutputMode.Append())
    val counts = out.where($"user_id" === 1L).select("n").as[Long].collect().sorted.toSeq
    assert(counts == Seq(1L, 2L))
  }

  test("sessionWindows merges a session across the micro-batch boundary; append emits once") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[EventRow]
    spark.catalog.dropTempView("t_sess_merge")
    val q = Streaming.sessionWindows(ms.toDF(), gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("t_sess_merge")
      .outputMode("append").start()
    // batch 1 opens the session; batch 2 lands INSIDE the gap and must
    // extend it in state, not open a second session
    ms.addData(EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    ms.addData(EventRow(2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.0))
    q.processAllAvailable()
    // sentinel advances the watermark past session end; second sentinel
    // batch flushes the armed emission
    ms.addData(EventRow(8L, ts("2024-01-02 00:00:00"), 9L, "wm", 0.0))
    q.processAllAvailable()
    ms.addData(EventRow(9L, ts("2024-01-03 00:00:00"), 9L, "wm", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_sess_merge").where($"user_id" === 1L)
      .select("session_start", "session_end", "n", "sum_value").collect()
    assert(rows.length == 1, "one merged session, emitted exactly once")
    assert(rows.head.getAs[Long]("n") == 2L)
    assert(rows.head.getAs[Double]("sum_value") == 3.0)
    assert(rows.head.getAs[java.sql.Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(rows.head.getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
  }

  test("dual write: foreachBatch streaming upsert equals batch recompute") {
    implicit val sq = spark.sqlContext
    import graft.operators.Latest
    val ms = MemoryStream[EventRow]
    // online side: snapshot maintained incrementally per micro-batch (the
    // foreachBatch MERGE pattern); offline side: append log
    var snapshot = Seq.empty[(Long, String, Double, java.sql.Timestamp, Long)]
      .toDF("user_id", "event_type", "value", "ts", "event_id")
    var offline = snapshot
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.select("user_id", "event_type", "value", "ts", "event_id")
        offline = offline.unionByName(b)
        snapshot = Latest.lwwUpsert(snapshot, b, Seq("user_id", "event_type"), "ts", "event_id", Seq("value"))
          .select("user_id", "event_type", "value", "ts", "event_id")
        ()
      }
      .outputMode("append").start()
    ms.addData(batch.take(2))
    q.processAllAvailable()
    ms.addData(batch.drop(2))
    q.processAllAvailable()
    q.stop()
    // online/offline consistency: incremental snapshot == recompute from log
    val recomputed = Latest.latestAgg(offline, Seq("user_id", "event_type"), "ts", "event_id", Seq("value"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_type", "value").orderBy("user_id", "event_type").collect().toSeq
    assert(canon(snapshot) == canon(recomputed))
    assert(offline.count() == 5) // append log keeps every row incl. dups
  }

  test("validatedIngestRouted sends bad rows to the reject branch with reasons") {
    val ms = mkStream(batch)
    val (valid, rejected) = Streaming.validatedIngestRouted(ms.toDF(), Seq("click", "view"))
    val v = Streaming.runToMemory(spark, valid, "t_route_ok", OutputMode.Append())
    val ms2 = mkStream(batch)
    val (_, rej2) = Streaming.validatedIngestRouted(ms2.toDF(), Seq("click", "view"))
    val r = Streaming.runToMemory(spark, rej2, "t_route_bad", OutputMode.Append())
    assert(v.count() == 4)
    val bad = r.collect()
    assert(bad.length == 1 && bad.head.getAs[String]("reject_reason") == "feature_not_active")
  }

  test("enrichOnline: stream-static join against the snapshot table") {
    val snapshot = Seq((1L, "click", 42.0), (2L, "view", 7.0))
      .toDF("user_id", "event_type", "latest_value")
    val ms = mkStream(Seq(
      EventRow(10L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      EventRow(11L, ts("2024-01-01 10:01:00"), 3L, "click", 0.0))) // no snapshot row
    val out = Streaming.runToMemory(
      spark,
      Streaming.enrichOnline(ms.toDF(), snapshot, Seq("user_id", "event_type")),
      "t_enrich", OutputMode.Append())
    val m = out.collect().map(r => r.getAs[Long]("event_id") ->
      (if (r.isNullAt(r.fieldIndex("latest_value"))) null else r.getAs[Double]("latest_value"))).toMap
    assert(m(10L) == 42.0)
    assert(m(11L) == null) // explicit-null contract survives streaming
  }

  test("latestStateTws (transformWithState) matches the flatMapGroupsWithState LWW semantics") {
    implicit val sq = spark.sqlContext
    Streaming.rocksDbStateConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ms = MemoryStream[EventRow]
      val q = Streaming.latestStateTws(ms.toDS())
        .writeStream.format("memory").queryName("t_tws").outputMode("update").start()
      ms.addData(EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      ms.addData(
        EventRow(2L, ts("2024-01-01 11:00:00"), 1L, "click", 9.0), // newer -> update
        EventRow(3L, ts("2024-01-01 09:00:00"), 1L, "click", 0.5)) // older -> ignored
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t_tws").orderBy("version").collect()
      assert(rows.length == 2)
      assert(rows.last.getAs[Double]("value") == 9.0)
      assert(rows.last.getAs[Int]("version") == 2)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("attributionJoin: stream-stream interval join attributes clicks inside the window") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val out = Streaming.attributionJoin(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.format("memory").queryName("t_attr").outputMode("append").start()
    clicks.addData(
      EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),  // 30 min before: attributed
      EventRow(2L, ts("2024-01-01 08:00:00"), 1L, "click", 2.0),  // 2.5 h before: outside window
      EventRow(3L, ts("2024-01-01 10:20:00"), 2L, "click", 3.0))  // other user
    purchases.addData(EventRow(10L, ts("2024-01-01 10:30:00"), 1L, "purchase", 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_attr").collect()
    assert(rows.map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet ==
      Set((1L, 10L)))
  }

  test("latestStateStreamTtl evicts idle keys past the TTL and emits tombstones (RocksDB state store)") {
    implicit val sq = spark.sqlContext
    // exercise the production state-store provider, not just the in-memory one
    Streaming.rocksDbStateConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ms = MemoryStream[EventRow]
      val q = Streaming
        .latestStateStreamTtl(ms.toDS(), java.time.Duration.ofHours(1), watermark = "0 seconds")
        .writeStream.format("memory").queryName("t_ttl").outputMode("update").start()

      ms.addData(EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0))
      q.processAllAvailable() // watermark -> 10:00, TTL armed for 11:00
      ms.addData(EventRow(2L, ts("2024-01-01 12:00:00"), 9L, "view", 2.0))
      q.processAllAvailable() // watermark -> 12:00 after this batch
      ms.addData(EventRow(3L, ts("2024-01-01 12:30:00"), 9L, "view", 3.0))
      q.processAllAvailable() // timeout for (1, click) fires: 12:00 > 11:00
      // key returns after eviction: version restarts at 1 (state was dropped)
      ms.addData(EventRow(4L, ts("2024-01-01 13:00:00"), 1L, "click", 5.0))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("t_ttl").collect()
      val tombstones = rows.filter(_.getAs[Boolean]("expired"))
      assert(tombstones.length == 1)
      assert(tombstones.head.getAs[Long]("user_id") == 1L)
      assert(tombstones.head.getAs[Double]("value") == 1.0)
      val rearrival = rows.filter(r => r.getAs[Long]("user_id") == 1L && !r.getAs[Boolean]("expired"))
        .maxBy(_.getAs[java.sql.Timestamp]("ts").getTime)
      assert(rearrival.getAs[Double]("value") == 5.0)
      assert(rearrival.getAs[Int]("version") == 1) // fresh state, not version 2
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("latestStateStream keeps last-write-wins state per key across batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val q = Streaming
      .latestStateStream(ms.toDS())
      .writeStream.format("memory").queryName("t_state").outputMode("update").start()

    ms.addData(EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    ms.addData(EventRow(2L, ts("2024-01-01 11:00:00"), 1L, "click", 9.0)) // newer -> update
    ms.addData(EventRow(3L, ts("2024-01-01 09:00:00"), 1L, "click", 0.5)) // older -> ignored
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_state").orderBy("version").collect()
    assert(rows.length == 2)
    assert(rows.last.getAs[Double]("value") == 9.0)
    assert(rows.last.getAs[Int]("version") == 2)
    // LWW state equals the batch recompute over the same rows
    val all = Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 11:00:00"), 1L, "click", 9.0),
      EventRow(3L, ts("2024-01-01 09:00:00"), 1L, "click", 0.5)).toDF()
    val batchLatest = graft.operators.Latest
      .latestAgg(all, Seq("user_id", "event_type"), "ts", "event_id", Seq("value"))
      .collect().head.getAs[Double]("value")
    assert(batchLatest == 9.0)
  }
}
