package graft

import org.apache.spark.sql.functions._

import graft.sources.CdcFeed

/** Pins the CDC netting rules ([[CdcFeed.net]]) that both continuous
  * CDC tails ([[graft.sources.DeltaInterop.tailDeltaCdcInto]] /
  * [[graft.sources.IcebergInterop.tailIcebergCdcInto]]) depend on:
  * later commits win, a same-commit preimage/postimage pair nets to the
  * replacement, a key whose last edge deletes nets to a delete, and an
  * unknown change kind refuses loudly instead of being dropped.
  */
class CdcFeedSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("k", "v")

  test("net: last edge per key wins; same-commit pairs collapse to the replacement") {
    val feed = Seq(
      // key 1: insert @v1, then MERGE pair @v2 — nets to the postimage
      (1L, 10.0, 1L, "insert"),
      (1L, 10.0, 2L, "update_preimage"),
      (1L, 11.0, 2L, "update_postimage"),
      // key 2: insert @v1, delete @v3 — nets to a delete
      (2L, 20.0, 1L, "insert"),
      (2L, 20.0, 3L, "delete"),
      // key 3: delete @v1, REINSERT @v2 — later commit wins, nets to insert
      (3L, 30.0, 1L, "delete"),
      (3L, 33.0, 2L, "insert"),
      // key 4: untouched single insert
      (4L, 40.0, 3L, "insert")
    ).toDF("k", "v", "ver", "kind")
    val batch = CdcFeed.net(feed, keys = Seq("k"), dataCols = cols,
      verCol = "ver", typeCol = "kind")
    assert(batch.upserts.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 11.0), (3L, 33.0), (4L, 40.0)))
    assert(batch.deleteKeys.as[Long].collect().toSeq == Seq(2L))
    // the outputs drop the feed metadata columns
    assert(batch.upserts.columns.toSeq == cols &&
      batch.deleteKeys.columns.toSeq == Seq("k"))
    batch.release()
  }

  test("net: an unknown change kind refuses loudly instead of being dropped") {
    val feed = Seq((1L, 1.0, 1L, "truncate")).toDF("k", "v", "ver", "kind")
    // net materializes eagerly, so the refusal fires at the call itself
    val e = intercept[Exception] { CdcFeed.net(feed, Seq("k"), cols, "ver", "kind") }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("unknown change type")),
      s"expected the refusal message, got: ${chain(e)}")
  }
}
