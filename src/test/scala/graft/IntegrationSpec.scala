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
}
