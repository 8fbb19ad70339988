package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** ACID behavior of the commit-log table: snapshot isolation, time travel,
  * MERGE upsert equivalence, optimistic concurrent writers, compaction
  * under concurrent appends.
  */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): TxTable =
    TxTable(spark, Files.createTempDirectory("graft_tx").toString)

  private def kv(rows: (Long, String, Double, Long)*) =
    rows.toDF("k", "f", "value", "ts")

  test("txn idempotence: a retried micro-batch commits exactly once (append and merge)") {
    // simulates foreachBatch's retry-after-partial-failure: the sink
    // committed batch N, the query crashed before advancing its offset log,
    // and the restarted query re-delivers batch N with the SAME id
    val t = newTable()
    assert(t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 1000L,
      txn = Some(("sink", 0L))) == 0L)
    assert(t.append(kv((2L, "b", 2.0, 10L)), tsMillis = 1001L,
      txn = Some(("sink", 1L))) == 1L)
    val (versions, rows) = (t.version(), t.read().count())

    // retried batch 1 (same id, same data): skipped, nothing changes
    assert(t.append(kv((2L, "b", 2.0, 10L)), tsMillis = 1002L,
      txn = Some(("sink", 1L))) == TxTable.SkippedCommit)
    // late replay of an OLDER batch: also skipped (watermark, not equality)
    assert(t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 1003L,
      txn = Some(("sink", 0L))) == TxTable.SkippedCommit)
    assert(t.version() == versions && t.read().count() == rows,
      "skipped deliveries must not advance the log or change the data")

    // merge path: same contract
    assert(t.merge(kv((1L, "a", 9.0, 99L)), Seq("k", "f"), "ts", "ts",
      tsMillis = 1004L, txn = Some(("sink", 2L))) == 2L)
    assert(t.merge(kv((1L, "a", 77.0, 100L)), Seq("k", "f"), "ts", "ts",
      tsMillis = 1005L, txn = Some(("sink", 2L))) == TxTable.SkippedCommit)
    val a1 = t.read().where(col("k") === 1L).select("value").as[Double].collect()
    assert(a1.toSeq == Seq(9.0), "the retried merge must not re-apply")

    // watermarks are per-app: a different sink id is not deduped
    assert(t.txnVersion("sink").contains(2L))
    assert(t.txnVersion("other").isEmpty)
    assert(t.append(kv((3L, "c", 3.0, 10L)), tsMillis = 1006L,
      txn = Some(("other", 0L))) >= 0L)
    // and a genuinely new batch id commits
    assert(t.append(kv((4L, "d", 4.0, 10L)), tsMillis = 1007L,
      txn = Some(("sink", 3L))) >= 0L)
  }

  test("txn appId with control characters is rejected (line-oriented log injection)") {
    val t = newTable()
    intercept[IllegalArgumentException] {
      t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 1000L,
        txn = Some(("app\nremove=evil.parquet", 0L)))
    }
    intercept[IllegalArgumentException] {
      t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 1000L, txn = Some(("", 0L)))
    }
  }

  test("skipping stats survive a ';' in the partition value (right-anchored log parse)") {
    // Hive path escaping leaves ';' alone, so the relative file path
    // contains the log's field separator — the stats/bloom lines must
    // still round-trip (the path field absorbs the ';')
    val t = newTable()
    t.append(
      Seq((1L, "a;b", 1.0), (2L, "a;b", 2.0), (3L, "plain", 30.0))
        .toDF("k", "part", "value"),
      tsMillis = 1000L, partitionBy = Seq("part"),
      statsCols = Seq("value"), bloomCols = Seq("k"))
    // range skipping: the value<=2 file group must exclude the 30.0 file
    val pruned = t.readWhere("value", 0.0, 5.0)
    assert(pruned.inputFiles.length < t.read().inputFiles.length,
      "stats recorded under a ';' path must still prune")
    assert(pruned.where(col("value") <= 5.0).count() == 2L)
    // bloom skipping on the same table
    val hit = t.readWhereIn("k", Seq("1"))
    assert(hit.inputFiles.length < t.read().inputFiles.length,
      "blooms recorded under a ';' path must still prune")
  }

  test("partition pruning matches values needing Hive path escaping") {
    val t = newTable()
    // ':' and '%' are escaped to %XX in the partition directory name; the
    // prune must compare LOGICAL values or these rows silently vanish
    val rows = Seq((1L, "a:b", 1.0), (2L, "plain", 2.0), (3L, "x%y", 3.0))
      .toDF("k", "part", "value")
    t.append(rows, partitionBy = Seq("part"))
    assert(t.readWherePartition("part", Seq("a:b")).select("k").as[Long].collect().toSeq == Seq(1L))
    assert(t.readWherePartition("part", Seq("x%y")).select("k").as[Long].collect().toSeq == Seq(3L))
    assert(t.readWherePartition("part", Seq("plain", "a:b")).count() == 2L)
    // bloom-free readWhereIn takes the same partition evidence path
    assert(t.readWhereIn("part", Seq("a:b")).select("k").as[Long].collect().toSeq == Seq(1L))
  }

  test("append with a case-variant column of a different type is a conflict, not evolution") {
    val t = newTable()
    t.append(Seq((1L, 1)).toDF("k", "id"))
    // `ID DOUBLE` vs table `id INT`: committing it as a NEW column would
    // produce a duplicate-case schema that breaks reads under Spark's
    // default case-insensitive analysis
    val bad = Seq((2L, 2.0)).toDF("k", "ID")
    intercept[IllegalArgumentException](t.append(bad, evolve = true))
  }

  test("changeFeed bootstraps from table birth with fromV = -1") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L) // v0
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L) // v1
    val feed = t.changeFeed(-1L, 1L)
      .select("_commit_version", "change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed == Set((0L, "insert", 1L), (1L, "insert", 2L)))
  }

  test("vacuum sweeps stale staging dirs and tmp log files") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)))
    val root = java.nio.file.Paths.get(t.root)
    val stale = Files.createTempDirectory(root, ".staging")
    Files.write(stale.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    val tmpLog = Files.createTempFile(root.resolve("_txlog"), ".tmp", ".commit")
    t.vacuum(minAgeMillis = 0L)
    assert(!Files.exists(stale) && !Files.exists(tmpLog))
    assert(t.read().count() == 1L) // live data untouched
  }

  test("append + read round-trip; versions are contiguous") {
    val t = newTable()
    assert(t.version() == -1L)
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L)
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L)
    assert(t.version() == 1L)
    assert(t.read().count() == 2L)
    assert(t.read().where($"k" === 2L).select("value").as[Double].head() == 2.0)
  }

  test("changeFeed: per-commit inserts/deletes with _commit_version; concatenation of diffs") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L)), tsMillis = 100L) // v0
    t.append(kv((3L, "a", 3.0, 30L)), tsMillis = 200L)                      // v1
    t.delete($"k" === 1L, tsMillis = 300L)                                  // v2
    val feed = t.changeFeed(0L, 2L)
      .select("_commit_version", "change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed == Set((1L, "insert", 3L), (2L, "delete", 1L)))
    // the feed over (from, to] concatenates the per-commit diffs: replaying
    // it on top of version `from` reconstructs version `to`
    val replayed = t.readVersion(0).select("k").as[Long].collect().toSet ++
      Set(3L) -- Set(1L)
    assert(replayed == t.readVersion(2).select("k").as[Long].collect().toSet)
    intercept[IllegalArgumentException](t.changeFeed(2L, 2L))
  }

  test("diff: file-pruned result equals the snapshot definition; evolved-schema range falls back") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L)), tsMillis = 100L) // v0
    t.append(kv((3L, "a", 3.0, 30L), (3L, "a", 3.0, 30L)), tsMillis = 200L) // v1 (dup row: multiset)
    t.delete($"k" === 1L, tsMillis = 300L)                                  // v2
    // pruned diff must equal the definitional full-snapshot exceptAll
    val got = t.diff(0L, 2L).select("change_type", "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val v0 = t.readVersion(0L); val v2 = t.readVersion(2L)
    val want = (v2.exceptAll(v0).withColumn("change_type", lit("insert"))
      .unionByName(v0.exceptAll(v2).withColumn("change_type", lit("delete"))))
      .select("change_type", "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == want)
    assert(got.count(_._1 == "insert") == 2, "duplicate inserted row diffs twice (multiset)")
    // a range whose endpoints have different schemas takes the full-compare
    // fallback and still works (columns follow the TO version)
    t.append(Seq((9L, "b", 9.0, 90L, "x")).toDF("k", "f", "value", "ts", "tag"),
      tsMillis = 400L, evolve = true)                                       // v3: widened
    val evolved = t.diff(2L, 3L).select("change_type", "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(evolved.contains(("insert", 9L)))
    // unknown versions still rejected on the pruned path
    intercept[IllegalArgumentException](t.diff(0L, 99L))
  }

  test("diff reads only files touched by the range, not the full snapshots") {
    val t = newTable()
    // v0: a large untouched base (2 files); v1: small append (1-2 files)
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L)).repartition(2), tsMillis = 100L)
    val v0Files = t.read().inputFiles.toSet
    t.append(kv((3L, "a", 3.0, 30L)), tsMillis = 200L)
    val d = t.diff(0L, 1L)
    val scanned = d.inputFiles.toSet
    assert(scanned.nonEmpty, "pruned diff still scans the added files")
    assert(scanned.intersect(v0Files).isEmpty,
      s"diff(0,1) must not read v0's untouched base files; scanned $scanned")
    assert(d.collect().map(_.getAs[String]("change_type")).toSeq == Seq("insert"))
  }

  test("schema evolution: evolve=true widens, old rows read null; guards reject silent loss") {
    val t = newTable()
    t.append(Seq((1L, "a", 10L)).toDF("k", "f", "ts"), tsMillis = 100L) // v0: no value col
    // extra column without evolve: rejected (it would be dropped on read)
    intercept[IllegalArgumentException](
      t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L))
    assert(t.version() == 0L, "rejected append must not commit")
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L, evolve = true) // v1: widens
    val rows = t.read().select("k", "value").as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(2.0)), "old rows read null in the new column")
    // time travel: v0 still has the ORIGINAL 3-column schema
    assert(t.readVersion(0).columns.toSeq == Seq("k", "f", "ts"))
    // a type change is never allowed, evolve or not
    intercept[IllegalArgumentException](
      t.append(Seq((3L, "a", "oops", 30L)).toDF("k", "f", "value", "ts"),
        tsMillis = 300L, evolve = true))
    // appends MISSING table columns are fine: their rows read as null there
    t.append(Seq((4L, "b", 40L)).toDF("k", "f", "ts"), tsMillis = 400L)
    assert(t.read().where($"k" === 4L).select("value").as[Option[Double]].head().isEmpty)
    // the widened schema survives a checkpoint-era read (schema recorded per evolve commit)
    assert(t.read().columns.toSeq == Seq("k", "f", "ts", "value"))
  }

  test("time travel: readVersion and readAsOfTimestamp see historical snapshots") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L)
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L)
    assert(t.readVersion(0).count() == 1L)
    assert(t.readVersion(1).count() == 2L)
    assert(t.readAsOfTimestamp(150L).count() == 1L) // only the ts=100 commit
    assert(t.readAsOfTimestamp(250L).count() == 2L)
    intercept[IllegalArgumentException](t.readAsOfTimestamp(50L))
  }

  test("merge equals a full LWW recompute and rewrites only affected files") {
    val t = newTable()
    // two appends -> at least two data files; keys 1,2 in one, 3 in another
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 10L)), tsMillis = 100L)
    t.append(kv((3L, "a", 3.0, 10L)), tsMillis = 200L)
    val updates = Seq(
      (1L, "a", 10.0, 20L), // newer ts: wins
      (2L, "a", 0.0, 5L),   // older ts: loses
      (4L, "a", 4.0, 10L)   // new key: insert
    ).toDF("k", "f", "value", "ts")
    t.merge(updates, keys = Seq("k", "f"), tsCol = "ts", tieCol = "ts", tsMillis = 300L)

    val got = t.read().orderBy("k").select("k", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))
    // copy-on-write pruning: key 3's file(s) held no matched key, so the
    // merge commit's remove list must be disjoint from the second append's
    // add list (parse the log directly — time travel can't see this, since
    // removed files stay on disk until vacuum)
    def actions(v: Long, key: String): Set[String] =
      Files.readAllLines(java.nio.file.Paths.get(t.root, "_txlog", f"$v%020d.txt"))
        .toArray.map(_.toString).filter(_.startsWith(s"$key=")).map(_.drop(key.length + 1)).toSet
    val secondAppendAdds = actions(1L, "add")
    val mergeRemoves = actions(2L, "remove")
    assert(mergeRemoves.nonEmpty, "merge must rewrite the matched files")
    assert(mergeRemoves.intersect(secondAppendAdds).isEmpty,
      s"merge rewrote unmatched files: $mergeRemoves vs $secondAppendAdds")
  }

  test("concurrent appends: every writer lands, versions stay contiguous") {
    val t = newTable()
    t.append(kv((0L, "seed", 0.0, 0L)), tsMillis = 1L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            t.append(kv((i.toLong, "c", i.toDouble, i.toLong)), tsMillis = i.toLong)
        })
      }
      val versions = futures.map(_.get())
      assert(versions.toSet.size == 8, "each concurrent commit got a distinct version")
      assert(t.read().count() == 9L)
      assert(t.version() == 8L)
    } finally pool.shutdown()
  }

  test("compaction under a concurrent append loses neither side") {
    val t = newTable()
    (1 to 5).foreach(i => t.append(kv((i.toLong, "c", i.toDouble, i.toLong)), tsMillis = i.toLong))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val compactF = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = t.compact(target = 1, tsMillis = 100L)
      })
      val appendF = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = t.append(kv((99L, "c", 99.0, 99L)), tsMillis = 101L)
      })
      compactF.get(); appendF.get()
      assert(t.read().count() == 6L, "compaction must not swallow the concurrent append")
      assert(t.read().where($"k" === 99L).count() == 1L)
    } finally pool.shutdown()
  }

  test("log checkpoints: published every 10th commit, reads resolve through them and around them") {
    val t = newTable()
    (0 to 11).foreach(i => t.append(kv((i.toLong, "c", i.toDouble, i.toLong)), tsMillis = i.toLong))
    val ckpt = java.nio.file.Paths.get(t.root, "_txlog", f"${10L}%020d.ckpt")
    assert(Files.exists(ckpt), "checkpoint at version 10 must exist")
    assert(t.read().count() == 12L)            // ckpt(10) + tail replay
    assert(t.readVersion(11).count() == 12L)   // through the checkpoint
    assert(t.readVersion(5).count() == 6L)     // below it: full-replay path
    // checkpoints are an optimization, not a correctness dependency
    Files.delete(ckpt)
    assert(t.read().count() == 12L)
  }

  test("FeatureStore saveTx/loadTxAsOf: the store reloads exactly as known at a past save") {
    import graft.store._
    val now = ts("2024-02-01 00:00:00")
    val fs = new FeatureStore(spark)
    val Right(hr) = fs.registerFeature("heart_rate", "1.0.0",
      FeatureSchemaMeta("heart_rate", "float64"), FeatureSourceMeta("batch"), "ops", now)
    fs.activateFeature(hr.feature_id, now)
    def ingest(v: Double, t: String): Unit = fs.ingestValues(
      Seq(("p1", "heart_rate", Some(v), ts(t)))
        .toDF("entity_id", "feature_name", "value_double", "event_timestamp"),
      Map("heart_rate" -> hr.feature_id), now)

    val dir = Files.createTempDirectory("graft_store_tx").toString
    ingest(70.0, "2024-01-01 00:00:00")
    fs.saveTx(dir, tsMillis = 1000L)
    ingest(80.0, "2024-01-10 00:00:00")
    fs.saveTx(dir, tsMillis = 2000L)

    // latest: both facts, LWW value 80
    val latest = FeatureStore.loadTx(spark, dir)
    assert(latest.valuesDF.count() == 2L)
    assert(latest.getFeatureValue("p1", hr.feature_id, now, "u", Seq(), now).contains(80.0))
    // as known at the first save: only the first fact existed
    val known = FeatureStore.loadTxAsOf(spark, dir, 1500L)
    assert(known.valuesDF.count() == 1L)
    assert(known.getFeatureValue("p1", hr.feature_id, now, "u", Seq(), now).contains(70.0))
    // overwrite is atomic versioned history, not a destructive rewrite
    intercept[IllegalArgumentException](FeatureStore.loadTxAsOf(spark, dir, 500L))
  }

  test("data skipping: readWhere scans only files whose recorded stats intersect the range") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 15L)), tsMillis = 100L, statsCol = Some("ts"))
    t.append(kv((3L, "a", 3.0, 110L), (4L, "a", 4.0, 115L)), tsMillis = 200L, statsCol = Some("ts"))
    t.append(kv((5L, "a", 5.0, 210L), (6L, "a", 6.0, 215L)), tsMillis = 300L, statsCol = Some("ts"))
    // only the middle append's files overlap [100, 150]
    val pruned = t.readWhere("ts", 100.0, 150.0)
    val ks = pruned.select("k").as[Long].collect().toSet
    assert(ks == Set(3L, 4L), s"expected only the middle batch's files, got keys $ks")
    // semantics preserved: pruned + exact filter == full read + exact filter
    assert(pruned.where($"ts".between(100L, 150L)).count() ==
      t.read().where($"ts".between(100L, 150L)).count())
    // a column without stats never prunes
    assert(t.readWhere("value", -1e9, 1e9).count() == 6L)
  }

  test("maintenance rewrites keep the skipping index: compact re-records stats") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L, statsCol = Some("ts"))
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L, statsCol = Some("ts"))
    t.compact(target = 1, tsMillis = 300L)
    // an out-of-range readWhere returns ZERO rows only if the compacted
    // file carries stats — a stats-less file is conservatively scanned in
    // full (readWhere prunes I/O, it does not filter rows)
    assert(t.readWhere("ts", 1e6, 2e6).count() == 0L)
    assert(t.readWhere("ts", 0.0, 100.0).count() == 2L)
  }

  test("concurrent merges with retry converge to the correct LWW state") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 10L)), tsMillis = 100L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = t.mergeRetrying(
          kv((1L, "a", 10.0, 20L)), Seq("k", "f"), "ts", "ts", tsMillis = 200L)
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = t.mergeRetrying(
          kv((3L, "a", 30.0, 20L)), Seq("k", "f"), "ts", "ts", tsMillis = 201L)
      })
      f1.get(); f2.get()
      val got = t.read().orderBy("k").select("k", "value").as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 10.0), (2L, 2.0), (3L, 30.0)))
    } finally pool.shutdown()
  }

  test("streaming micro-batches MERGE into a TxTable (foreachBatch lakehouse sink)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming.EventRow
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = newTable()
    val cols = Seq("user_id", "event_type", "value", "event_id", "ts")
    // seed an empty versioned table so micro-batches have a schema to merge into
    t.append(
      Seq.empty[EventRow].toDF().select(cols.map(org.apache.spark.sql.functions.col): _*),
      tsMillis = 0L)

    val ms = MemoryStream[EventRow]
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventRow], id: Long) =>
        t.merge(batch.toDF().select(cols.map(org.apache.spark.sql.functions.col): _*),
          keys = Seq("user_id", "event_type"), tsCol = "ts", tieCol = "event_id",
          tsMillis = 1000L + id)
        ()
      }
      .start()
    ms.addData(Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 11:00:00"), 2L, "view", 2.0)))
    q.processAllAvailable()
    ms.addData(Seq(
      EventRow(3L, ts("2024-01-01 12:00:00"), 1L, "click", 9.0), // newer: wins
      EventRow(4L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0))) // older: loses
    q.processAllAvailable()
    q.stop()

    val got = t.read().orderBy("user_id", "event_type")
      .select("user_id", "event_type", "value").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "click", 9.0), (2L, "view", 2.0)))
    assert(t.version() == 2L) // seed + two micro-batch merges
  }

  test("vacuum removes unreachable files but keeps the live snapshot intact") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L)
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L)
    t.compact(target = 1, tsMillis = 300L)
    // minAgeMillis = 0: test-only — production keeps the in-flight-writer guard
    t.vacuum(retainVersions = 1, minAgeMillis = 0L)
    assert(t.read().count() == 2L)                       // live snapshot intact
    intercept[Exception](t.readVersion(0).count())        // pre-compact files gone
  }

  test("date-partitioned layout: partition dirs, directory pruning before stats, merge keeps layout") {
    val t = newTable()
    def rows(day: Long, ks: Long*) =
      ks.map(k => (k, "a", k.toDouble, day * 100 + k, day)).toDF("k", "f", "value", "ts", "day")
    // version 0 declares the layout; later appends inherit it
    t.append(rows(1L, 1L, 2L), tsMillis = 100L, partitionBy = Seq("day"))
    t.append(rows(2L, 3L, 4L), tsMillis = 200L)
    t.append(rows(3L, 5L, 6L), tsMillis = 300L)
    assert(t.read().count() == 6L)
    assert(t.read().inputFiles.nonEmpty && t.read().inputFiles.forall(_.contains("/day=")))

    // exact-value partition pruning: only day=2's files are even LISTED
    val pruned = t.readWherePartition("day", Seq("2"))
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.forall(_.contains("/day=2/")),
      s"unpruned files: ${pruned.inputFiles.mkString(",")}")
    assert(pruned.select("k").as[Long].collect().toSet == Set(3L, 4L))

    // numeric range pruning through readWhere hits the partition dirs too
    // (no per-file stats were recorded — the directory alone prunes)
    val ranged = t.readWhere("day", 2.0, 3.0)
    assert(ranged.inputFiles.forall(f => f.contains("/day=2/") || f.contains("/day=3/")))
    assert(ranged.count() == 4L)

    // copy-on-write merge rewrites stay inside the layout and win LWW
    t.merge(Seq((3L, "a", 30.0, 1000L, 2L)).toDF("k", "f", "value", "ts", "day"),
      keys = Seq("k", "f"), tsCol = "ts", tieCol = "ts", tsMillis = 400L)
    assert(t.read().inputFiles.forall(_.contains("/day=")))
    assert(t.read().where($"k" === 3L).select("value").as[Double].head() == 30.0)
    assert(t.read().count() == 6L)
    // partition values survive the rewrite (read back from the directory)
    assert(t.read().where($"k" === 3L).select("day").as[Long].head() == 2L)

    // a conflicting layout on append is an error, not silent corruption
    intercept[IllegalArgumentException](
      t.append(rows(4L, 9L), tsMillis = 500L, partitionBy = Seq("f")))

    // and so is a partitioned append onto an existing FLAT table — the
    // mixed-depth file set would break partition discovery on every later
    // read, AFTER the commit already landed (layout is binding from v0)
    val flat = newTable()
    flat.append(rows(1L, 1L).drop("day"), tsMillis = 100L)
    intercept[IllegalArgumentException](
      flat.append(rows(2L, 2L), tsMillis = 200L, partitionBy = Seq("day")))
    assert(flat.read().count() == 1L) // table still readable, nothing landed
  }

  test("compact on a partitioned table honors the per-partition file target") {
    val t = newTable()
    def rows(day: Long, ks: Range) =
      ks.map(k => (k.toLong, "a", k.toDouble, day * 1000 + k, day)).toDF("k", "f", "value", "ts", "day")
    // several appends -> many files per partition
    (0 until 4).foreach(i => t.append(rows(1L, (i * 50) until (i * 50 + 50)), tsMillis = 100L + i,
      partitionBy = Seq("day")))
    (0 until 4).foreach(i => t.append(rows(2L, (i * 50) until (i * 50 + 50)), tsMillis = 200L + i))
    def filesPerDay: Map[String, Int] = t.read().inputFiles.toSeq
      .groupBy(f => if (f.contains("/day=1/")) "1" else "2").view.mapValues(_.size).toMap
    assert(filesPerDay.values.forall(_ >= 4))

    t.compact(target = 2, tsMillis = 500L)
    val after = filesPerDay
    assert(after.values.forall(n => n >= 1 && n <= 2),
      s"target=2 must cap files per partition: $after")
    assert(t.read().count() == 400L)

    // target=1 collapses each partition to a single file
    t.compact(target = 1, tsMillis = 600L)
    assert(filesPerDay.values.forall(_ == 1), s"target=1: $filesPerDay")
    assert(t.read().count() == 400L)
  }

  test("delete: removes exactly the matching rows, rewrites only affected files, keeps history") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L)), tsMillis = 100L)
    t.append(kv((3L, "b", 3.0, 30L), (4L, "b", 4.0, 40L)), tsMillis = 200L)
    val v = t.delete($"k" === 1L, tsMillis = 300L)
    assert(t.read().select("k").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // only the file(s) containing k=1 rewrote: the delete commit's remove
    // set must be disjoint from the second append's add set
    def actions(ver: Long, key: String): Set[String] =
      Files.readAllLines(java.nio.file.Paths.get(t.root, "_txlog", f"$ver%020d.txt"))
        .toArray.map(_.toString).filter(_.startsWith(s"$key=")).map(_.drop(key.length + 1)).toSet
    assert(actions(v, "remove").intersect(actions(1L, "add")).isEmpty,
      "delete rewrote a file with no matching rows")
    // history: the pre-delete snapshot still shows the purged row
    assert(t.readVersion(1).where($"k" === 1L).count() == 1L)
    // null predicate rows are KEPT (SQL DELETE semantics)
    t.append(kv((5L, null.asInstanceOf[String], 5.0, 50L)), tsMillis = 400L)
    t.delete($"f" === "zzz", tsMillis = 500L) // null for k=5 row -> kept; matches nothing
    assert(t.read().count() == 4L)
    // deleting everything leaves a readable empty table
    t.delete(lit(true), tsMillis = 600L)
    assert(t.read().count() == 0L)
  }

  test("zorder: content preserved bit-exact; both dimensions prune; stats survive compact") {
    val t = newTable()
    // 32x32 grid: k and ts are independent dimensions
    val grid = (0 until 1024).map(i => ((i % 32).toLong, "a", (i / 32).toDouble, (i / 32).toLong))
    t.append(kv(grid: _*), tsMillis = 100L)
    val before = t.read().agg(bit_xor(xxhash64($"k", $"f", $"value", $"ts"))).as[Long].head()

    t.zorder(Seq("k", "ts"), target = 16, tsMillis = 200L)
    assert(t.read().agg(bit_xor(xxhash64($"k", $"f", $"value", $"ts"))).as[Long].head() == before,
      "zorder is a pure layout rewrite")
    val total = t.read().inputFiles.length
    assert(total == 16)

    // one-dimensional reads prune on EITHER column (multi-column stats)
    val byK  = t.readWhere("k", 0.0, 3.0).inputFiles.length
    val byTs = t.readWhere("ts", 0.0, 3.0).inputFiles.length
    assert(byK < total, s"k-range read must prune ($byK/$total)")
    assert(byTs < total, s"ts-range read must prune ($byTs/$total)")
    // the two-dimensional read prunes at least as hard as either alone
    val both = t.readWhereAll(Seq(("k", 0.0, 3.0), ("ts", 0.0, 3.0)))
    assert(both.inputFiles.length <= math.min(byK, byTs))
    // and never drops rows: exact filter over pruned == over full
    assert(both.where($"k" <= 3L && $"ts" <= 3L).count() ==
      t.read().where($"k" <= 3L && $"ts" <= 3L).count())

    // maintenance keeps the TWO-column index: compact re-records both
    t.compact(target = 4, tsMillis = 300L)
    assert(t.readWhere("k", -10.0, -5.0).count() == 0L)
    assert(t.readWhere("ts", 1e6, 2e6).count() == 0L)
    assert(t.read().count() == 1024L)

    // time travel still sees the pre-zorder snapshot
    assert(t.readVersion(0).count() == 1024L)
  }

  test("restoreVersion: one-commit rollback, history intact after restore") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L)
    t.append(kv((2L, "a", 2.0, 20L)), tsMillis = 200L)
    t.delete($"k" === 1L, tsMillis = 300L) // v2 drops key 1
    val rv = t.restoreVersion(1L, tsMillis = 400L)
    assert(rv == 3L) // the rollback is itself a commit
    assert(t.read().orderBy("k").select("k").as[Long].collect().toSeq == Seq(1L, 2L))
    // the rolled-back-over version stays time-travelable until vacuum
    assert(t.readVersion(2).select("k").as[Long].collect().toSeq == Seq(2L))
    // restoring v0 from the post-restore state also works (restore-of-restore)
    t.restoreVersion(0L, tsMillis = 500L)
    assert(t.read().select("k").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException](t.restoreVersion(99L))
  }

  test("bloom skipping: readWhereIn prunes files, never loses a present key") {
    val t = newTable()
    // distinct key ranges per append -> each key lives in exactly one
    // commit's files; blooms should prune the other commit entirely
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"key_$i", i.toDouble, 10L)).toDF("k", "f", "value", "ts")
    t.append(batch(0, 400), tsMillis = 100L, bloomCols = Seq("f"))
    t.append(batch(400, 800), tsMillis = 200L) // inherits the active bloom column
    val all = t.read().inputFiles.length

    val hit = t.readWhereIn("f", Seq("key_7"))
    assert(hit.inputFiles.length < all, "bloom must prune at least one file")
    assert(hit.where($"f" === "key_7").count() == 1L)

    // NO false negatives: every key present in the table must survive its
    // own point lookup (the safety property pruning rests on)
    val sample = (0 until 800 by 97).map(i => s"key_$i")
    sample.foreach { key =>
      assert(t.readWhereIn("f", Seq(key)).where($"f" === key).count() == 1L,
        s"bloom pruning lost $key")
    }

    // an absent key may scan files (false positives) but returns no rows
    assert(t.readWhereIn("f", Seq("nope")).where($"f" === "nope").isEmpty)
    // a column with no blooms falls back to the full file set
    assert(t.readWhereIn("value", Seq("7.0")).inputFiles.length == all)
  }

  test("blooms survive maintenance rewrites and checkpoints") {
    val t = newTable()
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"key_$i", i.toDouble, 10L)).toDF("k", "f", "value", "ts")
    t.append(batch(0, 200), tsMillis = 100L, bloomCols = Seq("f"))
    // push past a checkpoint boundary (every 10 commits) with inheriting appends
    (1 to 10).foreach(i => t.append(batch(200L * i, 200L * (i + 1)), tsMillis = 100L + i))
    t.compact(target = 4, tsMillis = 5000L)

    // post-compact: the rewritten files re-recorded blooms (active-column
    // carry), so a point lookup still prunes AND still finds its row
    val all = t.read().inputFiles.length
    val hit = t.readWhereIn("f", Seq("key_1777"))
    assert(hit.where($"f" === "key_1777").count() == 1L)
    assert(hit.inputFiles.length < all, "compact dropped the bloom index")
  }

  test("zorder guards: needs two columns, flat layout only; checkpoint carries multi-col stats") {
    val t = newTable()
    t.append(kv((1L, "a", 1.0, 10L)), tsMillis = 100L)
    intercept[IllegalArgumentException](t.zorder(Seq("k")))

    // checkpoints fire every 10 commits; stats on (k, ts) must survive one
    val t2 = newTable()
    for (i <- 0 until 9)
      t2.append(kv((i.toLong, "a", i.toDouble, i.toLong * 100)), tsMillis = 100L + i,
        statsCols = Seq("k", "ts"))
    t2.compact(target = 1, tsMillis = 500L) // 10th commit -> checkpoint
    assert(t2.version() == 9L)
    assert(t2.readWhere("k", 100.0, 200.0).count() == 0L, "k stats live past the checkpoint")
    assert(t2.readWhere("ts", 1e7, 2e7).count() == 0L, "ts stats live past the checkpoint")
    assert(t2.read().count() == 9L)
  }

  test("cloneTxDir yields a fully independent table (mutating the clone leaves the template intact)") {
    // the round-5 harness leans on this: every mutating declared query runs
    // on a clone of a shared immutable template — a clone that still
    // referenced template files would corrupt every later query's fixture
    val tpl = newTable()
    tpl.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L)), tsMillis = 100L)
    tpl.append(kv((3L, "a", 3.0, 30L)), tsMillis = 200L)
    val clone = TxTable(spark, HarnessFixtures.cloneTxDir(tpl.root))
    assert(clone.read().count() == 3L)
    clone.delete($"k" <= 2L, tsMillis = 300L)
    clone.vacuum(retainVersions = 1, minAgeMillis = 0L) // physically retires clone files
    assert(clone.read().select("k").as[Long].collect().toSeq == Seq(3L))
    // the template is untouched: full content AND its history
    assert(tpl.read().count() == 3L)
    assert(tpl.readVersion(0L).count() == 2L)
    assert(tpl.version() == 1L)
  }

  test("8 concurrent writers, mixed append/merge/delete: serializable history, no lost updates") {
    // round-4 verdict #4: the optimistic commit protocol under real
    // contention. 8 writers race 14 operations (6 unique-key appends, 6
    // merges over ONE shared hot key range, 2 deletes) on one table. Every
    // op stamps a unique tsMillis, so the committed log itself tells us the
    // serial order the protocol chose; replaying the ops IN THAT ORDER
    // against an in-memory model must reproduce the final table exactly —
    // that is serializability + no lost updates in one check. Retries are
    // counted and must stay within the optimistic protocol's budget.
    import scala.jdk.CollectionConverters._
    val t = newTable()
    // seed: keys 0..59 (merges contend on 0..19, deleters own 20..39/40..59)
    t.append(kv((0L until 60L).map(k => (k, "a", 0.0, 0L)): _*), tsMillis = 1L)

    sealed trait Op { def tsMillis: Long }
    case class App(tsMillis: Long, rows: Seq[(Long, String, Double, Long)]) extends Op
    case class Mrg(tsMillis: Long, rows: Seq[(Long, String, Double, Long)]) extends Op
    case class Del(tsMillis: Long, lo: Long, hi: Long) extends Op

    val ops: Seq[Op] =
      // appenders: unique keys, no read set — land without conflict
      (0 until 3).flatMap { w =>
        Seq(
          App(1000L + w, (0 until 5).map(i => (1000L + w * 100 + i, "a", w.toDouble, 1L))),
          App(2000L + w, (0 until 5).map(i => (2000L + w * 100 + i, "a", w.toDouble, 2L))))
      } ++
      // mergers: all 6 ops upsert the SAME hot keys 0..19; LWW by (ts, tie)
      (3 until 6).flatMap { w =>
        Seq(
          Mrg(3000L + w, (0L until 20L).map(k => (k, "a", w * 10.0, 10L + w))),
          Mrg(4000L + w, (0L until 20L).map(k => (k, "a", w * 100.0, 20L + w))))
      } ++
      // deleters: disjoint seeded ranges nobody else touches
      Seq(Del(5006L, 20L, 39L), Del(5007L, 40L, 59L))

    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    def withRetry[T](f: => T): T = {
      var last: Throwable = null
      for (_ <- 0 until 50) {
        try return f
        catch { case e: java.util.ConcurrentModificationException =>
          retries.incrementAndGet(); last = e }
      }
      throw last
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      ops.map { op =>
        pool.submit(new Runnable {
          override def run(): Unit = op match {
            case App(ts, rows) => t.append(kv(rows: _*), tsMillis = ts)
            case Mrg(ts, rows) => withRetry(
              t.merge(kv(rows: _*), keys = Seq("k", "f"), tsCol = "ts", tieCol = "ts", tsMillis = ts))
            case Del(ts, lo, hi) => withRetry(t.delete($"k".between(lo, hi), tsMillis = ts))
          }
        })
      }.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()

    // 1. contiguous history: versions 0..14, one per op + seed, none lost
    val logDir = java.nio.file.Paths.get(t.root, "_txlog")
    val committed = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".txt")).toSeq.sorted
      .map { name =>
        val v = name.stripSuffix(".txt").toLong
        val ts = Files.readAllLines(logDir.resolve(name)).asScala
          .collectFirst { case l if l.startsWith("ts=") => l.drop(3).toLong }.get
        (v, ts)
      }
    assert(committed.map(_._1) == (0L to 14L), s"non-contiguous history: $committed")
    assert(t.version() == 14L)

    // 2. serializability / no lost updates: replay ops in the COMMIT order
    // the log recorded (matched back via the unique tsMillis stamps)
    val byStamp = ops.map(o => o.tsMillis -> o).toMap
    var model = (0L until 60L).map(k => (k, "a") -> (0.0, 0L)).toMap
    committed.drop(1).foreach { case (_, stamp) =>
      byStamp(stamp) match {
        case App(_, rows) => rows.foreach { case (k, f, v, ts) => model += (k, f) -> (v, ts) }
        case Mrg(_, rows) => rows.foreach { case (k, f, v, ts) =>
          model.get((k, f)) match {
            case Some((_, oldTs)) if oldTs >= ts => () // incumbent wins (tie: max tieCol=ts)
            case _ => model += (k, f) -> (v, ts)
          }
        }
        case Del(_, lo, hi) => model = model.filterNot { case ((k, _), _) => k >= lo && k <= hi }
      }
    }
    val got = t.read().select("k", "f", "value", "ts")
      .as[(Long, String, Double, Long)].collect()
      .map { case (k, f, v, ts) => (k, f) -> (v, ts) }.toMap
    assert(got.size == t.read().count(), "no duplicate live rows per key")
    assert(got == model, {
      val missing = model.keySet -- got.keySet; val extra = got.keySet -- model.keySet
      val changed = (model.keySet & got.keySet).filter(k => model(k) != got(k))
      s"lost/phantom updates — missing=$missing extra=$extra changed=${changed.map(k => (k, model(k), got(k)))}"
    })

    // 3. retry budget: each of the 8 read-set ops (merges/deletes) can in
    // the worst schedule collide with every other racing commit (~13), so
    // ~100 is the honest ceiling; beyond that the protocol is livelocking
    // (observed typical: 20-40)
    assert(retries.get() <= 100, s"excessive optimistic retries: ${retries.get()}")
    println(s"[tx-stress] 15 commits, ${retries.get()} optimistic retries")
  }

  test("applyCdc: one atomic delete+replace commit, unconditional wins, file pruning") {
    val t = newTable()
    // keys 1,2 in one file, 3 in another — the untouched file must survive
    t.append(kv((1L, "a", 1.0, 10L), (2L, "a", 2.0, 10L)), tsMillis = 100L)
    t.append(kv((3L, "a", 3.0, 10L)), tsMillis = 200L)
    val v0 = t.version()
    // a netted CDC batch: key 1 replaced (with an OLDER ts — unlike merge,
    // the incoming row wins unconditionally), key 4 inserted, key 2 deleted
    val ups = kv((1L, "a", 9.0, 5L), (4L, "a", 4.0, 10L))
    val dels = Seq((2L, "a")).toDF("k", "f")
    val v = t.applyCdc(ups, dels, keys = Seq("k", "f"), tsMillis = 300L,
      txn = Some(("cdc", 7L)))
    assert(v == v0 + 1)
    val got = t.read().orderBy("k").select("k", "value", "ts")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 9.0, 5L), (3L, 3.0, 10L), (4L, 4.0, 10L)),
      s"got $got")
    // pruning: key 3's file held no touched key — the commit's remove list
    // must be disjoint from the second append's add list
    def actions(ver: Long, key: String): Set[String] =
      Files.readAllLines(java.nio.file.Paths.get(t.root, "_txlog", f"$ver%020d.txt"))
        .toArray.map(_.toString).filter(_.startsWith(s"$key="))
        .map(_.drop(key.length + 1)).toSet
    val secondAppendAdds = actions(v0, "add")
    assert(actions(v, "remove").intersect(secondAppendAdds).isEmpty,
      "applyCdc rewrote a file holding no touched key")
    // txn idempotence: a replayed batch (same or older version) is skipped
    assert(t.applyCdc(ups, dels, Seq("k", "f"), tsMillis = 301L,
      txn = Some(("cdc", 7L))) == TxTable.SkippedCommit)
    assert(t.read().count() == 3L)
    // duplicate upsert keys refuse loudly — a replacement applied twice
    // would write two rows
    val dup = kv((5L, "a", 1.0, 1L), (5L, "a", 2.0, 2L))
    val e = intercept[IllegalArgumentException] {
      t.applyCdc(dup, dels.limit(0), Seq("k", "f"), tsMillis = 302L)
    }
    assert(e.getMessage.contains("duplicate"))
    // delete-only batch (no upserts) also lands atomically
    val v2 = t.applyCdc(ups.limit(0), Seq((4L, "a")).toDF("k", "f"),
      Seq("k", "f"), tsMillis = 303L)
    assert(v2 > v)
    assert(t.read().orderBy("k").select("k").as[Long].collect().toSeq ==
      Seq(1L, 3L))
    // NULL-SAFE keys: upstream producers match with <=> (a MERGE replaces
    // a null-keyed row), so the sink must replace — not append a twin
    val t2 = newTable()
    t2.append(Seq((1L, Option.empty[String], 1.0, 10L), (2L, Some("a"), 2.0, 10L))
      .toDF("k", "f", "value", "ts"), tsMillis = 100L)
    t2.applyCdc(
      Seq((1L, Option.empty[String], 9.0, 20L)).toDF("k", "f", "value", "ts"),
      Seq.empty[(Long, String)].toDF("k", "f"), Seq("k", "f"), tsMillis = 200L)
    val nullRows = t2.read().orderBy("k").select("k", "value")
      .as[(Long, Double)].collect().toSeq
    assert(nullRows == Seq((1L, 9.0), (2L, 2.0)),
      s"a null-keyed replacement must not duplicate: $nullRows")
  }
}
