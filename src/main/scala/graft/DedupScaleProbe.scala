package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev harness: MinHash-LSH dedup at synthetic scale. Generates nDocs
  * 60-word documents where groups of `clusterSize` share a base text with
  * ~3% per-doc word substitutions (planted near-dup clusters), then runs
  * the full minhashPairs pipeline.
  * Usage: runMain graft.DedupScaleProbe [nDocs] [clusterSize]
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100000L)
    val clusterSize = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = (0 until 256).map(i => s"w$i")
    val vocabCol = typedLit(vocab)
    val base = expr(s"id div $clusterSize")
    // word j: from the cluster base, except ~1-in-32 positions substituted
    // with a doc-specific word
    val words = transform(
      sequence(lit(0), lit(59)),
      j => when(
        pmod(xxhash64(col("id"), j), lit(32)) === 0,
        element_at(vocabCol, (pmod(xxhash64(col("id"), j, lit(1)), lit(256)) + 1).cast("int")))
        .otherwise(element_at(vocabCol, (pmod(xxhash64(base, j), lit(256)) + 1).cast("int"))))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"), concat_ws(" ", words).as("text"))

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 3, threshold = 0.3)
    val n = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // expected intra-cluster pairs: nDocs/clusterSize clusters x C(clusterSize,2)
    val expected = nDocs / clusterSize * (clusterSize.toLong * (clusterSize - 1) / 2)
    println(f"[dedup-scale] docs=$nDocs pairs=$n expected~$expected recall~${n.toDouble / expected}%.3f wall=$secs%.1fs")

    // ---- indexed incremental-jaccard leg (round 9): daily-batch cost must
    // scale with the BATCH, not the corpus. Build the persisted index once
    // over the corpus (untimed, the offline job), then probe it with a
    // small batch and with a 4x batch — the wall-clock ratio should track
    // the batch sizes, not the corpus, and the unindexed bipartite form
    // over the same corpus shows what the probe avoids (its per-day
    // re-shingling of all corpus text).
    val corpus = docs.where(col("doc_id") % 16 =!= 0)
    val batch1 = docs.where(col("doc_id") % 16 === 0 && col("doc_id") % 64 === 0)
    val batch4 = docs.where(col("doc_id") % 16 === 0)
    val idxDir = java.nio.file.Files.createTempDirectory("graft_dedup_scale").toString
    val tb = System.nanoTime()
    Dedup.saveDedupIndex(corpus, "doc_id", "text", idxDir,
      shingleN = 3, bands = 16, rowsPerBand = 3, jaccardDfCap = 50)
    println(f"[dedup-scale] index build (offline, untimed class) ${(System.nanoTime() - tb) / 1e9}%.1fs")
    def probe(tag: String, b: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val c = Dedup.incrementalJaccardPairsIndexed(b, idxDir, "doc_id", "text",
        shingleN = 3, threshold = 0.3, maxShingleDf = 50).count()
      println(f"[dedup-scale] indexed probe $tag batch=${b.count()} pairs=$c wall=${(System.nanoTime() - t) / 1e9}%.1fs")
    }
    probe("1x", batch1)
    probe("4x", batch4)
    val tu = System.nanoTime()
    val cu = Dedup.incrementalJaccardPairs(batch4, corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.3, maxShingleDf = 50).count()
    println(f"[dedup-scale] unindexed 4x (re-shingles corpus) pairs=$cu wall=${(System.nanoTime() - tu) / 1e9}%.1fs")
    spark.stop()
  }
}
