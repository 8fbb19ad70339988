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
}
