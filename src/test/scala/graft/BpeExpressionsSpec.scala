package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeExpressions}

/** Pins the native BPE Catalyst expressions against the reference encoder:
  * same tokens/counts as [[Bpe.encodeWord]] row for row, null/empty edges,
  * and survival through BOTH execution paths (whole-stage codegen on a
  * plain scan, and the interpreted fallback used inside certain operators)
  * — a codegen/eval divergence is the classic custom-expression bug.
  */
class BpeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
  private val merges = Bpe.train(vocab, numMerges = 8)
  private val ranks = Bpe.ranksOf(merges)

  test("native encode/count match the reference encoder on every doc") {
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "widest  lowest \t news"),
      (3L, ""),
      (4L, "   "),
      (5L, "unrelated zzz low")).toDF("id", "text")
    val got = docs.select(col("id"),
        BpeExpressions.encode(merges)(col("text")).as("toks"),
        BpeExpressions.count(merges)(col("text")).as("n"))
      .orderBy("id")
      .collect()
    docs.orderBy("id").collect().zip(got).foreach { case (in, out) =>
      val words = in.getString(1).trim.split("\\s+").toSeq.filter(_.nonEmpty)
      val want = words.map(w => Bpe.encodeWord(w, ranks))
      val toks = out.getSeq[scala.collection.Seq[String]](1).map(_.toSeq)
      assert(toks == want, s"row ${in.getLong(0)}")
      assert(out.getLong(2) == want.map(_.size.toLong).sum, s"count row ${in.getLong(0)}")
    }
  }

  test("null text is null out (nullIntolerant), not a crash or phantom tokens") {
    val df = Seq((1L, Some("low")), (2L, None))
      .toDF("id", "text")
    val rows = df.select(col("id"),
        BpeExpressions.count(merges)(col("text")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == 1L) // "low" is one learned token
    assert(rows(1).isNullAt(1))
  }

  test("expression is codegen-compatible: same result with codegen forced off") {
    val docs = Seq((1L, "newest widest lower")).toDF("id", "text")
    def run() = docs
      .select(BpeExpressions.count(merges)(col("text")).as("n"))
      .collect().head.getLong(0)
    val withCodegen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == withCodegen)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
