package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world this is a tiny document"),
    (1L, "another document with some more words inside of it"),
    (5L, "short one")
  ).toDF("doc_id", "text")

  test("syntheticMedia produces binary payload + typed metadata struct") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(m.schema("content").dataType.typeName == "binary")
    val r = m.where($"media_id" === 0L).select($"meta.media_type", length($"content")).head()
    assert(r.getString(0) == "image")
    assert(r.getInt(1) == "hello world this is a tiny document".length)
  }

  test("extractFeatures is deterministic and shuffle-free in shape") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.map(_.byte_entropy).toSeq == f2.map(_.byte_entropy).toSeq)
    assert(f1.head.pseudo_embedding.length == 16)
    assert(f1.forall(_.n_bytes > 0))
  }

  test("sampleFrames respects duration/stride/cap formula") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val counts = Multimodal.sampleFrames(m).groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: duration 0 -> max(0/10000,1)=1 frame; doc 5: 5000ms -> 1; doc 1: 1000ms -> 1
    assert(counts == Map(0L -> 1L, 1L -> 1L, 5L -> 1L))
    val big = Multimodal.syntheticMedia(Seq((99L, "x" * 100)).toDF("doc_id", "text"), "doc_id", "text")
    // duration 99*1000=99000 -> 9 frames capped at 8
    assert(Multimodal.sampleFrames(big).count() == 8L)
  }

  test("mediaStats groups by media_type") {
    val st = Multimodal.mediaStats(Multimodal.syntheticMedia(docs, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("image" -> 1L, "audio" -> 1L, "video" -> 1L))
  }
}
