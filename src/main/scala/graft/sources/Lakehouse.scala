package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned fact-table layout (SURVEY.md §4: "we must *choose* to
  * partition the fact table by date" — this is that choice, as code).
  *
  * At 100 TB the EAV log is a lakehouse table partitioned by `event_date`;
  * every as-of filter (`event_timestamp <= T`) implies
  * `event_date <= date(T)`, which prunes partitions BEFORE any file is
  * opened. [[readAsOf]] adds that implied predicate explicitly so static
  * partition pruning applies (shown in the plan as PartitionFilters).
  */
object Lakehouse {

  /** Write a fact log partitioned by the derived event_date. */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** As-of read with the partition predicate made explicit: row filter on
    * the timestamp + partition filter on event_date. */
  def readAsOf(spark: SparkSession, path: String, tsCol: String, asOf: String): DataFrame =
    read(spark, path)
      .where(col("event_date") <= to_date(lit(asOf)) && col(tsCol) <= lit(asOf).cast("timestamp"))

  /** Entity-bucketed catalog table: rows are hash-clustered into `nBuckets`
    * files per partition on `bucketCol` and sorted within each bucket.
    * Every recurring entity-keyed operation — as-of enrichment joins,
    * latest-per-key aggregation, orphan anti-joins — then reads
    * pre-clustered data: Catalyst drops the Exchange (and with sortBy, the
    * Sort) on the bucketed side entirely. At 100 TB that is THE difference
    * between re-shuffling the fact log on every query and shuffling it
    * once at write time. Bucket count should be sized so one bucket ≈ one
    * executor-core task (e.g. 4096 for a ~100 TB log).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    var w = df.write
      .bucketBy(nBuckets, bucketCol)
      .mode("overwrite")
      .format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Small-file compaction for a date-partitioned fact table (the
    * OPTIMIZE-style maintenance pass). Streaming/micro-batch appends leave
    * each date partition littered with tiny files; every later scan then
    * pays one task + one footer read per file. This rewrites each partition
    * into `filesPerPartition` files (clustered so one task writes one
    * file), into a staging dir, then swaps directories. The swap is two
    * renames, NOT atomic: a reader racing the swap can see a missing
    * table for an instant, and a crash between the renames leaves the
    * data under `path__old` (never deleted until both renames succeed —
    * every rename is checked, so no failure path deletes the only copy).
    * Returns (filesBefore, filesAfter).
    *
    * Parquet-level rewrite only — on a real deployment table formats
    * (Delta OPTIMIZE / Iceberg rewrite_data_files) give the same result
    * with snapshot isolation; this is the dependency-free equivalent for
    * the plain parquet lakehouse used here, to be run when the table is
    * not being read.
    */
  def compact(
      spark: SparkSession,
      path: String,
      filesPerPartition: Int = 1): (Long, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // count through the SAME Hadoop filesystem the swap uses: java.io.File
    // silently reports 0 for any non-local path (hdfs://, s3a://) and
    // NPEs on an unreadable subdirectory (listFiles() returns null)
    def countFiles(p: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = countFiles(path)
    val staging = path + "__compacting"
    val target = new org.apache.hadoop.fs.Path(path)
    val trash = new org.apache.hadoop.fs.Path(path + "__old")
    require(!fs.exists(trash),
      s"$trash exists — a previous compact crashed mid-swap; recover it before compacting")
    // deterministic spread key (hash of data columns, not
    // monotonically_increasing_id: a nondeterministic key re-routes rows on
    // partial stage recomputation — the SPARK-23207 corruption class)
    val df = spark.read.parquet(path)
    val spread = pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(filesPerPartition))
    df.repartition(col("event_date"), spread)
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(staging)
    if (!fs.rename(target, trash)) {
      // the table is untouched; don't leak the fully-written staging copy
      // (a complete duplicate of the table, silently doubling tmpfs/disk)
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw new java.io.IOException(s"compact: rename $target -> $trash failed; table untouched")
    }
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), target)) {
      // the error message must report the ACTUAL final state — claiming
      // "restored" while the rollback rename also failed would send the
      // operator away from a table that is simply missing
      val restored = fs.rename(trash, target)
      val state =
        if (restored) s"original restored; staging left at $staging"
        else s"ROLLBACK ALSO FAILED — table data sits at $trash, staging at $staging; manual recovery required"
      throw new java.io.IOException(s"compact: rename $staging -> $target failed; $state")
    }
    fs.delete(trash, true)
    (before, countFiles(path))
  }
}
