package graft

import org.apache.spark.sql.functions._

/** The p1 end-to-end corpus-preparation pipeline: the invariants a
  * training-data build relies on at each stage BOUNDARY (what the per-stage
  * oracles can't see — they certify each operator alone; these certify the
  * hand-offs).
  */
class PipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val out =
    SparkEntry.queries("p1_prepare_corpus")(spark, sfDir).cache()
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("p1: survivors are a subset of the non-benchmark corpus") {
    assert(out.where(col("doc_id") % 50 === 0).isEmpty)
    val orphans = out.select("doc_id")
      .join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(orphans.isEmpty)
  }

  test("p1: no two survivors share a content hash (dedup stage held)") {
    val hashes = out.select("doc_id")
      .join(docs, Seq("doc_id"))
      .groupBy(sha2(col("text"), 256)).count()
    assert(hashes.where(col("count") > 1).isEmpty)
  }

  test("p1: every survivor clears the quality floor") {
    assert(out.where(col("quality") < 0.5).isEmpty)
  }

  test("p1: no survivor shares an 8-gram with the benchmark slice") {
    val bench = docs.where(col("doc_id") % 50 === 0)
    val surviving = docs.join(out.select("doc_id"), Seq("doc_id"), "left_semi")
    val report = operators.Contamination.contaminationReport(
      surviving, bench, idCol = "doc_id", textCol = "text", n = 8)
    assert(report.isEmpty)
  }

  test("p2: no survivor duplicates the ingested corpus, exactly or nearly") {
    val out2 = SparkEntry.queries("p2_prepare_incremental")(spark, sfDir).cache()
    val corpus = docs.where(col("doc_id") % 3 =!= 0)
    // batch membership + within-batch uniqueness
    assert(out2.where(col("doc_id") % 3 =!= 0).isEmpty)
    val survivors = docs.join(out2.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(survivors.groupBy(sha2(col("text"), 256)).count()
      .where(col("count") > 1).isEmpty)
    // no survivor's text equals any corpus text
    assert(survivors.as("s")
      .join(corpus.as("c"), sha2(col("s.text"), 256) === sha2(col("c.text"), 256))
      .isEmpty)
    // no survivor has an exact-jaccard near-dup >= 0.3 in the corpus under
    // the pipeline's OWN df-cap basis (cap counted over raw batch ∪ corpus
    // — capping over survivors ∪ corpus instead would admit shingles the
    // pipeline had capped out, flagging correct outputs)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val residual = operators.Dedup.incrementalJaccardPairs(
        batch, corpus, idCol = "doc_id", textCol = "text",
        shingleN = 3, threshold = 0.3, maxShingleDf = 50)
      .join(out2.select(col("doc_id").as("new_id")), Seq("new_id"), "left_semi")
    assert(residual.isEmpty)
  }

  test("p2: the persisted exact index rejects the same ids as a direct corpus join") {
    val batch  = docs.where(col("doc_id") % 3 === 0)
    val corpus = docs.where(col("doc_id") % 3 =!= 0)
    val viaIndex = operators.Dedup.incrementalExactDups(
        batch, "doc_id", "text", SparkEntry.dedupIndexDirForTest(spark, sfDir))
      .select(col("new_id")).distinct()
    val direct = batch.as("b")
      .join(corpus.as("c"), sha2(col("b.text"), 256) === sha2(col("c.text"), 256))
      .select(col("b.doc_id").as("new_id")).distinct()
    assert(viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
  }

  test("p1: dedup keeps the minimum doc_id of each dropped duplicate group") {
    // every quality-surviving doc NOT in the output was dropped either as a
    // non-canonical duplicate (some smaller-id survivor shares its text) or
    // as contaminated — there is no third reason to lose a doc after the gate
    val scored = operators.TextAnalysis.withStats(
        docs.where(col("doc_id") % 50 =!= 0), "text")
      .withColumn("quality", operators.TextAnalysis.qualityScore(
        col("n_tokens"), col("n_stopwords"), col("avg_token_len")))
      .where(col("quality") >= 0.5)
      .select("doc_id", "text")
    val dropped = scored.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    val bench = docs.where(col("doc_id") % 50 === 0)
    val contaminatedIds = operators.Contamination.contaminationReport(
      scored, bench, idCol = "doc_id", textCol = "text", n = 8).select("doc_id")
    val unexplained = dropped
      .join(contaminatedIds, Seq("doc_id"), "left_anti")
      .as("d")
      .join(scored.as("s"), col("d.text") === col("s.text") &&
        col("s.doc_id") < col("d.doc_id"), "left_anti")
    assert(unexplained.isEmpty)
  }
}
