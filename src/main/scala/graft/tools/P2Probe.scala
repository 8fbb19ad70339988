package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPrep, Dedup}
import graft.sources.Tables

/** Throwaway dev probe: stage-level timing of p2_prepare_incremental. */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[p2probe] $tag%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }
    val idxDir = graft.SparkEntry.dedupIndexDirForTest(spark, dir)
    val docs = Tables.documents(spark, dir)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val corpus = docs.where(col("doc_id") % 3 =!= 0)
    val emptyBench = docs.where(lit(false)).select("doc_id", "text")

    time("prepareBatch") {
      val indexHashes = spark.read.parquet(s"$idxDir/exact").select("text_hash")
      CorpusPrep.prepareBatch(batch, emptyBench, idCol = "doc_id",
        textCol = "text", carryCols = Seq("lang", "source"),
        processedHashes = Some(indexHashes)).count()
    }
    time("incrJaccard (unindexed)") {
      Dedup.incrementalJaccardPairs(batch, corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.3, maxShingleDf = 50).count()
    }
    time("incrJaccard (indexed)") {
      Dedup.incrementalJaccardPairsIndexed(batch, idxDir, "doc_id", "text",
        shingleN = 3, threshold = 0.3, maxShingleDf = 50).count()
    }
    spark.stop()
  }
}
