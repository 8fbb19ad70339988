package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against silent testdata regeneration breaking declared queries.
  *
  * Round 3 lost 64 of 150 correctness rows because the driver regenerated
  * events.parquet with a different physical timestamp encoding and nothing
  * in `sbt test` exercised the declared queries against the shipped parquet:
  * `Verify` swallows per-query exceptions, so the failure surfaced only as
  * missing driver rows. This spec converts that failure mode into one red
  * test naming the query.
  *
  * Two layers, both analysis-only (no job execution):
  *   1. every `SparkEntry.queries` fn must ANALYZE against sf0.001 — calling
  *      the fn and touching `.schema` runs Catalyst resolution without
  *      launching a job;
  *   2. the raw parquet table schemas at sf0.01 and sf0.1 must equal their
  *      sf0.001 counterparts — the generator writes all SFs in one pass, so
  *      schema drift at one SF implies drift at all, and this covers the
  *      larger SFs without invoking eager query setup (TxTable builds etc.)
  *      three times over.
  */
class SchemaDriftSpec extends SparkSpec {
  private val sfBase = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def available: Boolean = new java.io.File(sfBase).isDirectory

  test("every declared query analyzes against the shipped sf0.001 testdata") {
    assume(available, s"$sfBase not present")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfBase).schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("table schemas at sf0.01 and sf0.1 match sf0.001") {
    assume(available, s"$sfBase not present")
    for (sf <- Seq("sf0.01", "sf0.1"); t <- tables) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/$t.parquet").exists) {
        val base  = spark.read.parquet(s"$sfBase/$t.parquet").schema
        val other = spark.read.parquet(s"$dir/$t.parquet").schema
        assert(other == base, s"$sf/$t.parquet schema drifted from sf0.001")
      }
    }
  }
}
