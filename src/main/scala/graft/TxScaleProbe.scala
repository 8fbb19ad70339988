package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the commit-log table: many-file table, MERGE that
  * rewrites only the files its keys touch, data-skipping reads, checkpointed
  * log resolution. Run: `runMain graft.TxScaleProbe [nRows] [nAppends]`.
  */
object TxScaleProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nAppends = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_tx_probe").toString
    val t = graft.sources.TxTable(spark, root)
    val perAppend = nRows / nAppends

    // nAppends disjoint key ranges -> each append's files carry a distinct
    // key span; stats recorded on k for data skipping
    var t0 = System.nanoTime()
    (0 until nAppends).foreach { i =>
      val lo = i * perAppend
      val df = spark.range(lo, lo + perAppend)
        .select(col("id").as("k"), (col("id") % 97).cast("double").as("value"),
          col("id").as("ts"))
      t.append(df, tsMillis = 1000L + i, statsCol = Some("k"))
    }
    val appendSec = (System.nanoTime() - t0) / 1e9
    val nFiles0 = t.read().select(input_file_name()).distinct().count()

    // merge touching only the FIRST append's key range: copy-on-write must
    // rewrite that range's files, not the table
    val updates = spark.range(0L, perAppend / 20)
      .select(col("id").as("k"), lit(999.0).as("value"), (col("id") + nRows).as("ts"))
    t0 = System.nanoTime()
    t.merge(updates, keys = Seq("k"), tsCol = "ts", tieCol = "ts", tsMillis = 5000L)
    val mergeSec = (System.nanoTime() - t0) / 1e9
    val logDir = java.nio.file.Paths.get(root, "_txlog")
    val mergeCommit = java.nio.file.Files.readAllLines(
      logDir.resolve(f"${nAppends.toLong}%020d.txt"))
    val removed = mergeCommit.toArray.map(_.toString).count(_.startsWith("remove="))

    // data-skipping read of one key span vs full scan
    t0 = System.nanoTime()
    val prunedFiles = t.readWhere("k", (5 * perAppend).toDouble, (6 * perAppend - 1).toDouble)
      .select(input_file_name()).distinct().count()
    val skipSec = (System.nanoTime() - t0) / 1e9

    val total = t.read().count()
    val merged999 = t.read().where(col("value") === 999.0).count()
    println(f"[tx-probe] rows=$total%d files=$nFiles0%d appends=$nAppends%d " +
      f"appendTotal=$appendSec%.1fs merge=$mergeSec%.1fs filesRewritten=$removed%d " +
      f"prunedReadFiles=$prunedFiles%d skipRead=$skipSec%.1fs mergedRows=$merged999%d " +
      f"version=${t.version()}%d")
    assert(merged999 == perAppend / 20, "merge must have applied")

    // ---- date-partitioned layout: directory pruning BEFORE file stats ----
    // same row count, partitioned by a derived "day" column; a one-day read
    // must list only that day's files (no stats needed at all)
    val proot = java.nio.file.Files.createTempDirectory("graft_tx_probe_part").toString
    val pt = graft.sources.TxTable(spark, proot)
    val nDays = 16
    t0 = System.nanoTime()
    (0 until nAppends).foreach { i =>
      val lo = i * perAppend
      val df = spark.range(lo, lo + perAppend)
        .select(col("id").as("k"), (col("id") % 97).cast("double").as("value"),
          col("id").as("ts"), (col("id") % nDays).as("day"))
      pt.append(df, tsMillis = 1000L + i, partitionBy = Seq("day"))
    }
    val partAppendSec = (System.nanoTime() - t0) / 1e9
    val allFiles = pt.read().select(input_file_name()).distinct().count()
    t0 = System.nanoTime()
    val oneDay = pt.readWherePartition("day", Seq("3"))
    val oneDayFiles = oneDay.select(input_file_name()).distinct().count()
    val partReadSec = (System.nanoTime() - t0) / 1e9
    val oneDayRows = oneDay.count()
    println(f"[tx-probe] partitioned: files=$allFiles%d oneDayFiles=$oneDayFiles%d " +
      f"(${100.0 * oneDayFiles / allFiles}%.0f%% listed) appendTotal=$partAppendSec%.1fs " +
      f"oneDayRead=$partReadSec%.1fs oneDayRows=$oneDayRows%d")
    // staged ids are [0, nAppends*perAppend) — floor math, NOT nRows, so
    // arg combos where nAppends doesn't divide nRows still assert correctly
    val staged = nAppends.toLong * perAppend
    val expectedDay3 = staged / nDays + (if (staged % nDays > 3) 1L else 0L)
    assert(oneDayRows == expectedDay3, "partition read must return exactly one day")
    assert(oneDayFiles * nDays <= allFiles * 2, "pruning must list ~1/nDays of the files")

    // ---- z-order vs linear clustering: two-dimensional pruning ----
    // same rows, two INDEPENDENT dimensions (k, and a decorrelated v2).
    // The append order clusters k, so k-ranges prune but v2-ranges cannot
    // (every file spans all of v2). After zorder(k, v2) a box predicate
    // narrow in BOTH dimensions scans a small corner of the files.
    val zroot = java.nio.file.Files.createTempDirectory("graft_tx_probe_z").toString
    val zt = graft.sources.TxTable(spark, zroot)
    val zdf = spark.range(0L, nRows).select(
      col("id").as("k"),
      ((col("id") * 2654435761L) % nRows).as("v2"), // decorrelated second dim
      (col("id") % 97).cast("double").as("value"))
    // linear baseline: 32 files range-clustered on k (the natural
    // "sorted by primary key" layout), stats on both columns
    zt.append(zdf.repartitionByRange(32, col("k")), tsMillis = 1000L,
      statsCols = Seq("k", "v2"))
    val v2Only = Seq(("v2", 0.0, nRows / 8.0))
    val box    = Seq(("k", 0.0, nRows / 8.0), ("v2", 0.0, nRows / 8.0))
    val linTotal  = zt.read().inputFiles.length
    val linV2     = zt.readWhereAll(v2Only).inputFiles.length // k-layout can't prune v2
    t0 = System.nanoTime()
    zt.zorder(Seq("k", "v2"), target = 32, tsMillis = 3000L)
    val zorderSec = (System.nanoTime() - t0) / 1e9
    val zTotal = zt.read().inputFiles.length
    val zV2    = zt.readWhereAll(v2Only).inputFiles.length
    val zBox   = zt.readWhereAll(box).inputFiles.length
    val boxRows = zt.readWhereAll(box)
      .where(col("k") <= nRows / 8 && col("v2") <= nRows / 8).count()
    println(f"[tx-probe] zorder: files=$linTotal%d->$zTotal%d " +
      f"v2Read=$linV2%d->$zV2%d files, 2dBoxRead=$zBox%d files " +
      f"rewrite=$zorderSec%.1fs boxRows=$boxRows%d")
    assert(linV2 == linTotal, "a k-clustered layout cannot prune the second dimension")
    assert(zV2 < zTotal, "z-order must prune the second dimension alone")
    assert(zBox <= zV2, "the 2-dim box prunes at least as hard as one dimension")
    val boxRowsFull = zt.read()
      .where(col("k") <= nRows / 8 && col("v2") <= nRows / 8).count()
    assert(boxRows == boxRowsFull, "pruning must not drop rows")

    // ---- commit cost vs table age: the hot path must stay FLAT ----
    // 60 tiny appends; with filename-derived versions + checkpoint-resolved
    // state a late commit parses at most checkpointEvery tail commits, so
    // the last-10 average must not grow with the log (a full-replay commit
    // path degrades linearly — this is the regression this probe pins)
    val aroot = java.nio.file.Files.createTempDirectory("graft_tx_probe_age").toString
    val at = graft.sources.TxTable(spark, aroot)
    val tiny = spark.range(0L, 100L).select(col("id").as("k"), col("id").cast("double").as("value"))
    val times = (0 until 60).map { i =>
      val s0 = System.nanoTime()
      at.append(tiny, tsMillis = 1000L + i)
      (System.nanoTime() - s0) / 1e9
    }
    val first10 = times.take(10).sum / 10
    val last10 = times.takeRight(10).sum / 10
    println(f"[tx-probe] commit-age: first10=$first10%.3fs/commit last10=$last10%.3fs/commit " +
      f"(x${last10 / first10}%.2f at 60 commits)")
    assert(last10 < first10 * 3 + 0.2, "append cost must stay flat as the log grows")
    spark.stop()
  }
}
