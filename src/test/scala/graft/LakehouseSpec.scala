package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Lakehouse, Tables}

class LakehouseSpec extends SparkSpec {

  test("date-partitioned write + as-of read prunes partitions before the scan") {
    val dir = Files.createTempDirectory("graft_lakehouse").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Lakehouse.writeDatePartitioned(ev, dir, "ts")

    // events span 2024-01-01..2024-01-30 -> ~30 date partitions on disk
    val partDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_date="))
    assert(partDirs >= 28, s"expected ~30 partitions, got $partDirs")

    val asOf = Lakehouse.readAsOf(spark, dir, "ts", "2024-01-05 00:00:00")
    // correctness: only rows <= as-of survive
    val maxTs = asOf.agg(max("ts")).collect().head.getTimestamp(0)
    assert(!maxTs.after(ts("2024-01-05 00:00:00")))

    // plan: partition filter present, and far fewer files read than total
    val scan = asOf.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"), scan)
    val pruned = asOf.select(input_file_name()).distinct().count()
    val total  = Lakehouse.read(spark, dir).select(input_file_name()).distinct().count()
    assert(pruned <= 5 && total >= 28, s"pruned=$pruned total=$total")
  }

  test("compact rewrites a fragmented date-partitioned table with identical content") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // fragment: many tasks per date partition -> many small files
    Lakehouse.writeDatePartitioned(ev.repartition(8), dir, "ts")
    val checksumBefore = Lakehouse.read(spark, dir)
      .agg(expr("bit_xor(xxhash64(event_id, ts, value))")).collect().head.getLong(0)
    val (before, after) = Lakehouse.compact(spark, dir)
    assert(before > after, s"before=$before after=$after")
    val re = Lakehouse.read(spark, dir)
    val checksumAfter = re
      .agg(expr("bit_xor(xxhash64(event_id, ts, value))")).collect().head.getLong(0)
    assert(checksumAfter == checksumBefore)
    // still partitioned (as-of reads keep pruning)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("event_date=")))
  }

  test("bucketed tables join without any exchange; unbucketed join shuffles") {
    import spark.implicits._
    val facts = (1L to 200L).map(i => (i % 40, i, i * 1.5)).toDF("user_id", "event_id", "value")
    val dims  = (0L until 40L).map(i => (i, s"user_$i")).toDF("user_id", "name")
    Lakehouse.writeBucketed(facts, "t_facts_b", "user_id", 4, sortCols = Seq("user_id"))
    Lakehouse.writeBucketed(dims, "t_dims_b", "user_id", 4, sortCols = Seq("user_id"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so bucketing is what's tested
    try {
      val joined = Lakehouse.readTable(spark, "t_facts_b")
        .join(Lakehouse.readTable(spark, "t_dims_b"), "user_id")
      assert(joined.count() == 200L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must be exchange-free:\n$plan")
      // contrast: the same join over raw (unbucketed) frames must shuffle
      val shuffled = facts.join(dims, "user_id")
      assert(shuffled.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS t_facts_b")
      spark.sql("DROP TABLE IF EXISTS t_dims_b")
    }
  }
}
