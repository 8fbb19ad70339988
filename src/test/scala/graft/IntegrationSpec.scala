package graft

import org.apache.spark.sql.functions._
import graft.store._
import graft.sources.Tables

/** End-to-end user story over the real testdata files: register features,
  * bulk-ingest the events log through the validated path, build a
  * leakage-free training set from a purchase spine, and serve a vector —
  * the full reference workflow (SURVEY.md §3 EP1-EP3) through the public
  * FeatureStore API against sf0.001.
  */
class IntegrationSpec extends SparkSpec {

  private val now = ts("2024-02-01 00:00:00")

  test("reference workflow end-to-end on sf0.001 events") {
    val fs = new FeatureStore(spark)
    val Right(click) = fs.registerFeature("click_value", "1.0.0",
      FeatureSchemaMeta("click_value", "float64", entity_type = "user"),
      FeatureSourceMeta("batch"), "ops", now)
    val Right(purchase) = fs.registerFeature("purchase_value", "1.0.0",
      FeatureSchemaMeta("purchase_value", "float64", entity_type = "user"),
      FeatureSourceMeta("batch"), "ops", now,
      phiLevel = "indirect", accessRoles = Seq("analyst"))
    fs.activateFeature(click.feature_id, now)
    fs.activateFeature(purchase.feature_id, now)

    // bulk ingest: events log -> EAV rows through the validated path
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id").cast("string").as("entity_id"),
        concat(col("event_type"), lit("_value")).as("feature_name"),
        col("value").as("value_double"),
        col("ts").as("event_timestamp"))
      .withColumn("value_string", lit(null).cast("string"))
    val accepted = fs.ingestValues(ev,
      Map("click_value" -> click.feature_id, "purchase_value" -> purchase.feature_id), now)
    assert(accepted > 300)

    // leakage-free training set: purchases spine enriched with latest click
    val spine = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("entity_id"), col("ts").as("event_timestamp"))
    val training = fs.getPointInTimeFeatures(spine, Seq("click_value"))
    assert(training.columns.toSeq ==
      Seq("entity_id", "event_timestamp", "click_value", "click_value__timestamp"))
    // no leakage: every carried timestamp <= spine timestamp
    assert(training.where(col("click_value__timestamp") > col("event_timestamp")).isEmpty)
    assert(training.where(col("click_value").isNotNull).count() > 100)

    // serving: vector read with RBAC (roleless user sees purchase masked)
    val vec = fs.getFeatureVector(Seq("7"), Seq(click.feature_id, purchase.feature_id),
      ts("2024-01-31 00:00:00"), "svc", Seq("ml_engineer"), now)
    val row = vec.collect().head
    assert(!row.isNullAt(1)) // click visible
    assert(row.isNullAt(2))  // purchase PHI-masked
    assert(fs.audit.exists(_.action == "access_denied"))
  }

  test("training-corpus assembly pipeline end-to-end on sf0.001 documents") {
    import graft.operators.{Contamination, Dedup, Sampling}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n0 = docs.count()

    // 1) quality gate (Gopher-style): drop heavily self-repeating docs
    val rep = Contamination.repetitionReport(docs, "doc_id", "text", n = 3)
    val clean = docs.join(
      rep.where(col("rep_ratio") > 0.5).select("doc_id"), Seq("doc_id"), "left_anti")

    // 2) benchmark decontamination: the held-out slice plays the eval set
    val bench = clean.where(col("doc_id") % 50 === 0)
    val corpus = clean.where(col("doc_id") % 50 =!= 0)
    val decon = Contamination.decontaminate(corpus, bench, "doc_id", "text", n = 8)

    // 3) near-dup resolution: keep only cluster canonicals
    val pairs = Dedup.jaccardPairs(
      decon.withColumn("blk", lit(1)), "doc_id", "text", Seq("blk"), 3, 0.5).localCheckpoint()
    val canon = Dedup.connectedComponents(pairs)
    val deduped = decon.join(
      canon.where(col("doc_id") =!= col("canonical_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")

    // 4) domain mixture + 5) split — both deterministic, so the pipeline
    // is replayable end-to-end
    val sources = deduped.select("source").distinct().as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq
    val mix = Sampling.domainMix(deduped, "source", "doc_id",
      sources.zipWithIndex.map { case (s, i) => s -> (if (i % 2 == 0) 100 else 50) }.toMap)
    val out = Sampling.withSplit(mix, "doc_id")

    val nOut = out.count()
    assert(nOut > 0 && nOut < n0, s"pipeline must filter something: $nOut of $n0")
    // every stage's contract holds on the survivors
    assert(out.where(col("doc_id") % 50 === 0).isEmpty)        // no benchmark docs
    assert(out.select("split").distinct().count() <= 3)        // valid splits only
    // survivors share no 8-gram with the benchmark (the decontamination contract)
    val leaked = Contamination.contaminationReport(out, bench, "doc_id", "text", 8)
    assert(leaked.isEmpty, "decontaminated corpus must not share benchmark grams")
    // determinism: the whole pipeline replays to the identical id set
    val replay = Sampling.withSplit(
      Sampling.domainMix(deduped, "source", "doc_id",
        sources.zipWithIndex.map { case (s, i) => s -> (if (i % 2 == 0) 100 else 50) }.toMap),
      "doc_id")
    assert(replay.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
