package graft

import org.apache.spark.sql.functions._
import graft.store._

/** Behavioral parity with the reference's entry points (SURVEY.md §3):
  * registration lifecycle, PHI constraints, group validation, validated
  * ingest, RBAC'd reads with audit, explicit-null vectors, point-in-time
  * enrichment.
  */
class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private val now = ts("2024-02-01 00:00:00")

  private def newStore(): (FeatureStore, String, String) = {
    val fs = new FeatureStore(spark)
    val Right(hr) = fs.registerFeature(
      "heart_rate", "1.0.0",
      FeatureSchemaMeta("heart_rate", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "ops", now)
    val Right(dx) = fs.registerFeature(
      "diagnosis_risk", "1.0.0",
      FeatureSchemaMeta("diagnosis_risk", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "ops", now,
      phiLevel = "direct", accessRoles = Seq("doctor"))
    fs.activateFeature(hr.feature_id, now)
    fs.activateFeature(dx.feature_id, now)
    (fs, hr.feature_id, dx.feature_id)
  }

  private def ingestSample(fs: FeatureStore, hrId: String, dxId: String): Long = {
    val df = Seq(
      ("p1", "heart_rate", Some(70.0), ts("2024-01-01 00:00:00")),
      ("p1", "heart_rate", Some(80.0), ts("2024-01-10 00:00:00")),
      ("p1", "diagnosis_risk", Some(0.9), ts("2024-01-05 00:00:00")),
      ("p2", "heart_rate", Some(60.0), ts("2024-01-03 00:00:00")),
      ("p1", "unregistered", Some(1.0), ts("2024-01-01 00:00:00")), // rejected
      ("p2", "heart_rate", None, ts("2024-01-04 00:00:00"))          // null -> rejected
    ).toDF("entity_id", "feature_name", "value_double", "event_timestamp")
      .withColumn("value_string", lit(null).cast("string"))
    fs.ingestValues(df, Map("heart_rate" -> hrId, "diagnosis_risk" -> dxId), now)
  }

  test("saveBucketed: latest-per-key over the bucketed fact table plans without an Exchange") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    fs.saveBucketed("fsb", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.table("fsb_values")
      val latest = graft.operators.Latest.latestAgg(
        facts, Seq("entity_id", "feature_id"), "event_timestamp", "feature_name", Seq("value_double"))
      // HashPartitioning(entity_id) from the buckets satisfies the
      // ClusteredDistribution(entity_id, feature_id) the aggregate needs —
      // the write-time shuffle replaces every query-time one
      val plan = latest.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed latest-agg must be exchange-free:\n$plan")
      assert(latest.count() == 3L) // (p1,hr) (p1,dx) (p2,hr)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS fsb_values")
      spark.sql("DROP TABLE IF EXISTS fsb_registry")
    }
  }

  test("registration: vocab + PHI constraints + lifecycle") {
    val fs = new FeatureStore(spark)
    assert(fs.registerFeature("x", "1", FeatureSchemaMeta("x", "bogus"),
      FeatureSourceMeta("batch"), "o", now).isLeft)
    assert(fs.registerFeature("x", "1", FeatureSchemaMeta("x", "float64"),
      FeatureSourceMeta("batch"), "o", now, phiLevel = "direct").isLeft) // PHI needs roles
    val Right(f) = fs.registerFeature("x", "1", FeatureSchemaMeta("x", "float64"),
      FeatureSourceMeta("batch"), "o", now)
    assert(f.status == "draft")
    assert(f.feature_id.startsWith("feat_") && f.feature_id.length == 21)
    assert(fs.deprecateFeature(f.feature_id, now).isRight)
    assert(fs.activateFeature(f.feature_id, now).isLeft) // deprecated -/-> active
  }

  test("group creation validates membership and entity_type") {
    val (fs, hrId, dxId) = newStore()
    assert(fs.createFeatureGroup("g", "patient", Seq(hrId, "nope"), "", "o", now).isLeft)
    val Right(g) = fs.createFeatureGroup("g", "patient", Seq(hrId, dxId), "", "o", now)
    assert(g.group_id.startsWith("grp_") && g.features.size == 2)
  }

  test("ingest accepts only active+typed rows") {
    val (fs, hrId, dxId) = newStore()
    assert(ingestSample(fs, hrId, dxId) == 4L) // 6 rows - unregistered - null
  }

  test("getFeatureValue: as-of argmax + RBAC deny -> None + audit trail") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    // as-of Jan 5: only the Jan 1 heart_rate row is visible
    assert(fs.getFeatureValue("p1", hrId, ts("2024-01-05 00:00:00"), "u", Seq(), now).contains(70.0))
    assert(fs.getFeatureValue("p1", hrId, ts("2024-01-31 00:00:00"), "u", Seq(), now).contains(80.0))
    // PHI denied for roleless user; allowed for doctor
    assert(fs.getFeatureValue("p1", dxId, now, "u", Seq("analyst"), now).isEmpty)
    assert(fs.getFeatureValue("p1", dxId, now, "u", Seq("doctor"), now).contains(0.9))
    val actions = fs.audit.map(_.action)
    assert(actions.count(_ == "access_denied") == 1)
    assert(actions.count(_ == "access") == 3)
  }

  test("getFeatureVector: wide row, deny->null, unknown->null column") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val vec = fs.getFeatureVector(Seq("p1", "p2"), Seq(hrId, dxId, "feat_unknown"),
      ts("2024-01-31 00:00:00"), "u", Seq("analyst"), now)
    assert(vec.columns.toSeq == Seq("entity_id", hrId, dxId, "feat_unknown"))
    val m = vec.collect().map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(m("p1") == ((80.0, null, null))) // dx masked (PHI), unknown null
    assert(m("p2") == ((60.0, null, null)))
  }

  test("getPointInTimeFeatures: leakage-free enrichment with __timestamp cols") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val spine = Seq(
      ("p1", ts("2024-01-05 00:00:00")),
      ("p1", ts("2024-01-15 00:00:00")),
      ("p2", ts("2024-01-01 00:00:00"))
    ).toDF("entity_id", "event_timestamp")
    val out = fs.getPointInTimeFeatures(spine, Seq("heart_rate"))
    assert(out.columns.toSeq == Seq("entity_id", "event_timestamp", "heart_rate", "heart_rate__timestamp"))
    val rows = out.orderBy("entity_id", "event_timestamp").collect()
    assert(rows(0).getAs[Double]("heart_rate") == 70.0) // p1 @ Jan5 -> Jan1 value
    assert(rows(1).getAs[Double]("heart_rate") == 80.0) // p1 @ Jan15 -> Jan10 value
    assert(rows(2).isNullAt(2)) // p2 @ Jan1: no prior observation
  }

  test("name resolution picks the numerically-highest active version (1.10.0 > 1.9.0)") {
    val fs = new FeatureStore(spark)
    def reg(v: String, value: Double, activate: Boolean = true): String = {
      val Right(f) = fs.registerFeature("hr", v,
        FeatureSchemaMeta("hr", "float64", entity_type = "patient"),
        FeatureSourceMeta("batch"), "o", now)
      if (activate) fs.activateFeature(f.feature_id, now)
      val df = Seq(("p1", "hr", Some(value), ts("2024-01-01 00:00:00")))
        .toDF("entity_id", "feature_name", "value_double", "event_timestamp")
        .withColumn("value_string", lit(null).cast("string"))
      fs.ingestValues(df, Map("hr" -> f.feature_id), now)
      f.feature_id
    }
    reg("1.9.0", 9.0)
    reg("1.10.0", 10.0)           // lexicographically BELOW "1.9.0"
    reg("2.0.0", 99.0, activate = false) // draft — active versions win regardless
    val spine = Seq(("p1", ts("2024-01-15 00:00:00"))).toDF("entity_id", "event_timestamp")
    val out = fs.getPointInTimeFeatures(spine, Seq("hr")).collect().head
    assert(out.getAs[Double]("hr") == 10.0,
      "must resolve to active 1.10.0, not lexicographic max 1.9.0 or draft 2.0.0")
    // the key itself: numeric components padded, non-numeric fall back to text
    assert(FeatureStore.versionSortKey("1.10.0") > FeatureStore.versionSortKey("1.9.0"))
    assert(FeatureStore.versionSortKey("1.2.0-beta") != FeatureStore.versionSortKey("1.2.0"))
  }

  test("enforceRetention drops only rows past the per-feature horizon") {
    val fs = new FeatureStore(spark)
    val Right(shortF) = fs.registerFeature("short_lived", "1.0.0",
      FeatureSchemaMeta("short_lived", "float64"), FeatureSourceMeta("batch"), "o", now,
      retentionDays = 10)
    fs.activateFeature(shortF.feature_id, now)
    val df = Seq(
      ("p1", "short_lived", Some(1.0), ts("2024-01-30 00:00:00")), // 2d old: kept
      ("p1", "short_lived", Some(2.0), ts("2023-12-01 00:00:00"))  // 62d old: dropped
    ).toDF("entity_id", "feature_name", "value_double", "event_timestamp")
      .withColumn("value_string", lit(null).cast("string"))
    fs.ingestValues(df, Map("short_lived" -> shortF.feature_id), now)
    val removed = fs.enforceRetention(now)
    assert(removed == 1L)
    assert(fs.valuesDF.count() == 1L)
    // the fact log's declared column ORDER survives the retention join
    // (usingColumns moves feature_id first; positional consumers must not break)
    assert(fs.valuesDF.columns.toSeq == fs.valuesSchema.fieldNames.toSeq)
  }

  test("derived feature: register with parents, materialize, read back") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val Right(risk) = fs.registerDerivedFeature(
      "risk_score", "1.0.0",
      FeatureSchemaMeta("risk_score", "float64", entity_type = "patient"),
      parentIds = Seq(hrId, dxId),
      sqlExpr = "heart_rate * 0.01 + diagnosis_risk",
      owner = "ops", now = now)
    fs.activateFeature(risk.feature_id, now)
    assert(risk.dependencies == Seq(hrId, dxId))
    assert(risk.source.source_type == "derived")

    val n = fs.materializeDerived(risk.feature_id, ts("2024-01-31 00:00:00"), now)
    assert(n == 1L) // only p1 has both parents
    val v = fs.getFeatureValue("p1", risk.feature_id, now, "u", Seq(), now)
    assert(v.contains(80.0 * 0.01 + 0.9)) // latest hr=80, dx=0.9
    // p2 lacks diagnosis_risk -> no derived row
    assert(fs.getFeatureValue("p2", risk.feature_id, now, "u", Seq(), now).isEmpty)
  }

  test("materializeAllDerived resolves a two-level DAG in dependency order and rejects cycles") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val Right(risk) = fs.registerDerivedFeature(
      "risk_score", "1.0.0",
      FeatureSchemaMeta("risk_score", "float64", entity_type = "patient"),
      parentIds = Seq(hrId, dxId),
      sqlExpr = "heart_rate * 0.01 + diagnosis_risk",
      owner = "ops", now = now)
    // level 2: derived of derived
    val Right(flag) = fs.registerDerivedFeature(
      "risk_flag", "1.0.0",
      FeatureSchemaMeta("risk_flag", "float64", entity_type = "patient"),
      parentIds = Seq(risk.feature_id),
      sqlExpr = "CASE WHEN risk_score > 1.0 THEN 1.0 ELSE 0.0 END",
      owner = "ops", now = now)
    fs.activateFeature(risk.feature_id, now)
    fs.activateFeature(flag.feature_id, now)

    val Right(counts) = fs.materializeAllDerived(ts("2024-01-31 00:00:00"), now)
    assert(counts(risk.feature_id) == 1L)
    assert(counts(flag.feature_id) == 1L) // saw risk_score's row from THIS pass
    // hr=80, dx=0.9 -> risk 1.7 -> flag 1.0
    assert(fs.getFeatureValue("p1", flag.feature_id, now, "u", Seq(), now).contains(1.0))

    // cycle detection: self-referential derived feature
    val Right(selfy) = fs.registerDerivedFeature(
      "selfy", "1.0.0", FeatureSchemaMeta("selfy", "float64", entity_type = "patient"),
      parentIds = Seq(risk.feature_id), sqlExpr = "risk_score", owner = "ops", now = now)
    fs.restoreFeature(selfy.copy(dependencies = Seq(selfy.feature_id)))
    assert(fs.materializeAllDerived(ts("2024-01-31 00:00:00"), now).isLeft)
  }

  test("save/load round-trip preserves catalog and values (lakehouse layout)") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    fs.save(dir)
    val re = FeatureStore.load(spark, dir)
    assert(re.registryFeatures.map(_.feature_id).toSet == fs.registryFeatures.map(_.feature_id).toSet)
    assert(re.valuesDF.count() == fs.valuesDF.count())
    // reloaded store answers the same as-of query
    assert(re.getFeatureValue("p1", hrId, ts("2024-01-31 00:00:00"), "u", Seq(), now).contains(80.0))
    // and the reloaded facts are date-partitioned on disk
    assert(new java.io.File(s"$dir/feature_values").listFiles()
      .exists(_.getName.startsWith("event_date=")))
  }

  test("feature groups persist across save/load and saveTx/loadTx; pre-groups layouts load") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val Right(g) = fs.createFeatureGroup("vitals", "patient", Seq(hrId, dxId), "d", "o", now)

    // lakehouse layout
    val dir = java.nio.file.Files.createTempDirectory("graft_store_grp").toString
    fs.save(dir)
    val re = FeatureStore.load(spark, dir)
    assert(re.featureGroups.map(_.group_id) == Seq(g.group_id))
    assert(re.featureGroup(g.group_id).exists(_.features == Seq(hrId, dxId)))

    // transactional layout: staged lazily like the registry
    val txDir = java.nio.file.Files.createTempDirectory("graft_store_grp_tx").toString
    fs.saveTx(txDir, tsMillis = 1000L)
    val reTx = FeatureStore.loadTx(spark, txDir)
    assert(reTx.groupsPendingForTest, "loadTx must stage groups, not materialize them")
    assert(reTx.featureGroups.map(_.name) == Seq("vitals"))
    assert(!reTx.groupsPendingForTest)

    // a PRE-groups layout (no feature_groups table) loads with empty groups
    // instead of failing — backward compatibility with earlier saves
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(new java.io.File(s"$dir/feature_groups"))
    deleteRec(new java.io.File(s"$txDir/feature_groups"))
    assert(FeatureStore.load(spark, dir).featureGroups.isEmpty)
    assert(FeatureStore.loadTx(spark, txDir).featureGroups.isEmpty)
  }

  test("registerDerivedFeature rejects duplicate parent names (two versions of one feature)") {
    val (fs, hrId, _) = newStore()
    val Right(hr2) = fs.registerFeature(
      "heart_rate", "2.0.0",
      FeatureSchemaMeta("heart_rate", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "ops", now)
    fs.activateFeature(hr2.feature_id, now)
    // both parents pivot to a column named "heart_rate" — ambiguous; the
    // misconfiguration must die at registration, not at materialize time
    val r = fs.registerDerivedFeature(
      "hr_blend", "1.0.0",
      FeatureSchemaMeta("hr_blend", "float64", entity_type = "patient"),
      parentIds = Seq(hrId, hr2.feature_id),
      sqlExpr = "heart_rate * 2", owner = "ops", now = now)
    assert(r.isLeft && r.left.exists(_.contains("share a feature name")))
  }

  test("loadTx stages the catalog lazily: no driver round-trip until first catalog access") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val dir = java.nio.file.Files.createTempDirectory("graft_store_lazy").toString
    fs.saveTx(dir, tsMillis = 1000L)
    val re = FeatureStore.loadTx(spark, dir)
    assert(re.registryPendingForTest,
      "loadTx must stage the registry as a Dataset, not materialize it")
    // fact-log-only usage never pays the catalog materialization
    assert(re.valuesDF.count() == fs.valuesDF.count())
    assert(re.registryPendingForTest, "reading facts must not hydrate the catalog")
    // the BATCH paths answer by bounded lookup / broadcast join — none of
    // them may hydrate the whole catalog onto the driver (round-7 verdict
    // #9: no driver round-trip on the batch read path)
    val vec = re.getFeatureVector(Seq("p1"), Seq(hrId, dxId),
      ts("2024-01-31 00:00:00"), "u", Seq("clinical"), now)
    assert(vec.count() == 1L)
    assert(re.registryPendingForTest, "getFeatureVector must not hydrate the catalog")
    import spark.implicits._
    val spine = Seq(("p1", ts("2024-01-31 00:00:00")))
      .toDF("entity_id", "event_timestamp")
    assert(re.getPointInTimeFeatures(spine, Seq("heart_rate")).count() == 1L)
    assert(re.registryPendingForTest, "getPointInTimeFeatures must not hydrate the catalog")
    assert(re.registryDS.where(
      org.apache.spark.sql.functions.col("status") === "active").count() >= 1L)
    assert(re.registryPendingForTest, "registryDS must pass the staged Dataset through")
    assert(re.enforceRetention(now) == 0L)
    assert(re.registryPendingForTest, "enforceRetention must not hydrate the catalog")
    // first catalog access hydrates, once, with the full feature set
    assert(re.registryFeatures.map(_.feature_id).toSet ==
      fs.registryFeatures.map(_.feature_id).toSet)
    assert(!re.registryPendingForTest)
    // and the hydrated store answers the same as-of query
    assert(re.getFeatureValue("p1", hrId, ts("2024-01-31 00:00:00"), "u", Seq(), now).contains(80.0))
  }

  test("registryDS supports distributed metadata filters (C1)") {
    val (fs, _, dxId) = newStore()
    val phi = fs.registryDS.where(org.apache.spark.sql.functions.col("phi_level") === "direct")
      .collect().map(_.feature_id).toSeq
    assert(phi == Seq(dxId))
  }

  test("typed ingest round-trips every reference value type through its storage column") {
    val fs = new FeatureStore(spark)
    val types = Seq(
      "int32", "int64", "float32", "float64", "string", "bool", "timestamp",
      "array_int", "array_float", "array_string", "embedding")
    val ids = types.map { vt =>
      val Right(f) = fs.registerFeature(s"f_$vt", "1", FeatureSchemaMeta(s"f_$vt", vt),
        FeatureSourceMeta("batch"), "o", now)
      fs.activateFeature(f.feature_id, now)
      s"f_$vt" -> f.feature_id
    }.toMap

    val t0 = ts("2024-01-10 00:00:00")
    def row(vt: String) = {
      import org.apache.spark.sql.Row
      val nulls = Seq[Any](null, null, null, null, null, null)
      val idx = Map("value_double" -> 0, "value_string" -> 1, "value_bool" -> 2,
        "value_timestamp" -> 3, "value_array_double" -> 4, "value_array_string" -> 5)
      val v: Any = vt match {
        case "int32" | "int64" | "float32" | "float64" => 7.5
        case "string" => "hello"
        case "bool" => true
        case "timestamp" => ts("2024-01-09 00:00:00")
        case "array_int" | "array_float" | "embedding" => Seq(1.0, 2.0)
        case "array_string" => Seq("a", "b")
      }
      val sc = fs.storageColFor(vt)
      Row.fromSeq(Seq[Any](s"e_$vt", s"f_$vt") ++ nulls.updated(idx(sc), v) :+ t0)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("entity_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("feature_name", org.apache.spark.sql.types.StringType)) ++
      fs.valuesSchema.fields.filter(f => f.name.startsWith("value_") && f.name != "value_type") :+
      org.apache.spark.sql.types.StructField("event_timestamp", org.apache.spark.sql.types.TimestampType))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(types.map(row)), schema)
    assert(fs.ingestValues(df, ids, now) == types.size.toLong)

    val snap = fs.onlineSnapshot(now).collect()
      .map(r => r.getAs[String]("feature_id") -> r).toMap
    assert(snap(ids("f_float64")).getAs[Double]("value_double") == 7.5)
    assert(snap(ids("f_int64")).getAs[Double]("value_double") == 7.5)
    assert(snap(ids("f_string")).getAs[String]("value_string") == "hello")
    assert(snap(ids("f_bool")).getAs[Boolean]("value_bool"))
    assert(snap(ids("f_timestamp")).getAs[java.sql.Timestamp]("value_timestamp") == ts("2024-01-09 00:00:00"))
    assert(snap(ids("f_embedding")).getAs[scala.collection.Seq[Double]]("value_array_double").toSeq == Seq(1.0, 2.0))
    assert(snap(ids("f_array_string")).getAs[scala.collection.Seq[String]]("value_array_string").toSeq == Seq("a", "b"))
  }

  test("typed ingest rejects wrong-column and null-typed rows (pinned stricter than reference)") {
    val fs = new FeatureStore(spark)
    val Right(fb) = fs.registerFeature("flag", "1", FeatureSchemaMeta("flag", "bool"),
      FeatureSourceMeta("batch"), "o", now)
    val Right(ft) = fs.registerFeature("seen", "1", FeatureSchemaMeta("seen", "timestamp"),
      FeatureSourceMeta("batch"), "o", now)
    fs.activateFeature(fb.feature_id, now); fs.activateFeature(ft.feature_id, now)
    val ids = Map("flag" -> fb.feature_id, "seen" -> ft.feature_id)
    // bool value arriving in value_double: rejected, not coerced
    val wrongCol = Seq(("e1", "flag", Some(1.0), ts("2024-01-01 00:00:00")))
      .toDF("entity_id", "feature_name", "value_double", "event_timestamp")
    assert(fs.ingestValues(wrongCol, ids, now) == 0L)
    // the reference skips TIMESTAMP validation entirely (its _validate_value
    // has no TIMESTAMP check) and accepts None for every type; we pin the
    // stricter rule — a timestamp feature row with a null value_timestamp
    // is rejected
    val nullTs = Seq(("e1", "seen", Option.empty[java.sql.Timestamp], ts("2024-01-01 00:00:00")))
      .toDF("entity_id", "feature_name", "value_timestamp", "event_timestamp")
    assert(fs.ingestValues(nullTs, ids, now) == 0L)
    // and the happy row lands
    val ok = Seq(("e1", "flag", Some(true), ts("2024-01-01 00:00:00")))
      .toDF("entity_id", "feature_name", "value_bool", "event_timestamp")
    assert(fs.ingestValues(ok, ids, now) == 1L)
  }

  test("getFeatureVector anchors on requested entities: no-fact and all-denied entities get null rows") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    // p_ghost has no facts at all -> present with nulls
    val vec = fs.getFeatureVector(Seq("p1", "p_ghost"), Seq(hrId),
      ts("2024-01-31 00:00:00"), "u", Seq("analyst"), now)
    val m = vec.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(m.keySet == Set("p1", "p_ghost"))
    assert(m("p1") == 80.0 && m("p_ghost") == null)
    // every feature denied -> still one row per requested entity, all null
    val denied = fs.getFeatureVector(Seq("p1", "p2"), Seq(dxId),
      ts("2024-01-31 00:00:00"), "u", Seq("analyst"), now)
    val dm = denied.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(dm == Map("p1" -> null, "p2" -> null))
  }

  test("onlineSnapshot is latest-per-key") {
    val (fs, hrId, dxId) = newStore()
    ingestSample(fs, hrId, dxId)
    val snap = fs.onlineSnapshot(ts("2024-01-31 00:00:00"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("value_double")).toMap
    assert(snap(("p1", hrId)) == 80.0)
    assert(snap(("p2", hrId)) == 60.0)
  }
}
