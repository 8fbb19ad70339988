package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev harness: the corpus-statistics operators at synthetic scale —
  * TF-IDF top-terms (the heaviest: a vocabulary-keyed shuffle join over the
  * exploded corpus), BM25 retrieval (postings filtered before the shuffle),
  * unigram-LM scoring, and concatenate-and-pack (distributed prefix sum).
  * Same deterministic pseudo-text generator as ContaminationScaleProbe.
  * Usage: runMain graft.TextOpsScaleProbe [nDocs]
  */
object TextOpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def text(id: Column): Column = array_join(
      transform(sequence(lit(1), lit(48)),
        i => concat(lit("w"), pmod(xxhash64(id * 131 + i), lit(5000)))), " ")
    val corpus = spark.range(0L, nDocs)
      .select(col("id").as("doc_id"), text(col("id")).as("text"))
      .localCheckpoint() // time the operators, not the generator

    var t0 = System.nanoTime()
    val nTfidf = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", k = 3).count()
    val tfidfSec = (System.nanoTime() - t0) / 1e9
    assert(nTfidf == nDocs * 3, s"every doc gets k terms: $nTfidf")

    t0 = System.nanoTime()
    val bm25 = TextAnalysis.bm25(corpus, "doc_id", "text",
      queryTerms = Seq("w17", "w501", "w4999"), k = 20).collect()
    val bm25Sec = (System.nanoTime() - t0) / 1e9
    assert(bm25.length == 20 && bm25.forall(_.getDouble(1) > 0))

    t0 = System.nanoTime()
    val nLm = TextAnalysis.unigramLogProb(corpus, "doc_id", "text").count()
    val lmSec = (System.nanoTime() - t0) / 1e9
    assert(nLm == nDocs)

    t0 = System.nanoTime()
    val packed = TextAnalysis.packSequences(corpus, "doc_id", "text", capacity = 512)
    val tokenTotal = packed.agg(sum("n_tokens")).collect().head.getLong(0)
    val packSec = (System.nanoTime() - t0) / 1e9
    assert(tokenTotal == nDocs * 48, s"packing must conserve every token: $tokenTotal")

    println(f"[textops-probe] docs=$nDocs%d tfidf=$tfidfSec%.1fs (${nDocs / tfidfSec}%.0f docs/s) " +
      f"bm25=$bm25Sec%.1fs (${nDocs / bm25Sec}%.0f docs/s) " +
      f"unigramLm=$lmSec%.1fs (${nDocs / lmSec}%.0f docs/s) " +
      f"pack=$packSec%.1fs (${nDocs / packSec}%.0f docs/s)")
    spark.stop()
  }
}
