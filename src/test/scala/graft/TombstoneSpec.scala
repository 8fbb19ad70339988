package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPrep

/** CorpusPrep.prepareBatch's tombstone contract — the cross-batch edge the
  * p1≡p3 oracle can only certify if the shipped corpus happens to contain
  * it (it usually doesn't): a later batch's duplicate of a canonical that
  * was processed but NOT kept (contaminated) must still die as a duplicate,
  * because batch-mode dedup runs before decontamination.
  */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  // quality >= 0.5 needs tokens + stopwords; both texts clear the gate
  private val gram = "alpha beta gamma delta epsilon zeta eta theta"
  private val dirty =
    s"the quick brown fox jumps over the lazy dog $gram and of to is in that it with for more words here now"
  private val clean =
    "the quick brown fox jumps over the lazy dog and of to is in that it with for many other words go here"
  private val bench = Seq((0L, gram)).toDF("doc_id", "text")

  private def prep(batch: org.apache.spark.sql.DataFrame,
      seen: Option[org.apache.spark.sql.DataFrame]) =
    CorpusPrep.prepareBatch(batch, bench, idCol = "doc_id", textCol = "text",
      carryCols = Seq.empty, processedHashes = seen)

  test("contaminated canonical is tombstoned (kept=false), clean doc kept") {
    val m = prep(Seq((10L, dirty), (11L, clean)).toDF("doc_id", "text"), None)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(m == Map(10L -> false, 11L -> true))
  }

  test("later-batch duplicate of a tombstoned canonical still dies as a duplicate") {
    val b1 = prep(Seq((10L, dirty), (11L, clean)).toDF("doc_id", "text"), None)
      .localCheckpoint()
    val b2 = prep(Seq((40L, dirty)).toDF("doc_id", "text"),
      Some(b1.select("text_hash")))
    assert(b2.isEmpty, "duplicate of a contaminated canonical resurfaced")
    // and WITHOUT the tombstone (kept rows only) it would wrongly survive —
    // the failure mode the contract exists to prevent
    val b2bad = prep(Seq((40L, dirty)).toDF("doc_id", "text"),
      Some(b1.where(col("kept")).select("text_hash")))
    assert(b2bad.count() == 1)
  }

  test("within-batch duplicates collapse to the minimum id") {
    val m = prep(Seq((7L, clean), (3L, clean)).toDF("doc_id", "text"), None)
      .select("doc_id").as[Long].collect().toSeq
    assert(m == Seq(3L))
  }

  test("SAME-ID redelivery within one micro-batch emits one manifest row, not two") {
    // at-least-once sources can deliver one record twice inside a single
    // batch; the canonical semi-join keys on id, so without an explicit
    // same-id collapse BOTH copies would survive it and the manifest would
    // carry the hash twice (review finding)
    val m = prep(Seq((5L, clean), (5L, clean)).toDF("doc_id", "text"), None)
    assert(m.count() == 1L, "one manifest row per newly-processed hash")
    assert(m.select("doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("reserved output column names in the batch are refused loudly") {
    val e = intercept[IllegalArgumentException] {
      prep(Seq((1L, clean)).toDF("doc_id", "text")
        .withColumn("quality", org.apache.spark.sql.functions.lit(9.9)), None)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("below-quality docs are rejected without a tombstone") {
    val junk = "x"
    val b1 = prep(Seq((20L, junk)).toDF("doc_id", "text"), None)
    assert(b1.isEmpty)
  }
}
