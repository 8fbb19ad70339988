package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{DeltaInterop, TxTable}

/** Pins the open-format boundary: a TxTable exported with
  * [[DeltaInterop.exportDelta]] is a standard Delta table (protocol /
  * metaData / add actions with partitionValues), readable back through
  * [[DeltaInterop.readDelta]]; and readDelta honors foreign logs —
  * multi-commit add/remove replay, parquet checkpoints, URI-encoded
  * paths — while failing LOUDLY on reader features it cannot honor.
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def sampleTable(): TxTable = {
    val t = TxTable(spark, tmp("delta_src"))
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v"), tsMillis = 1000L)
    t.append(Seq((4L, "c", 40.0)).toDF("id", "k", "v"), tsMillis = 2000L)
    t
  }

  test("flat export round-trips through readDelta and is structurally a Delta table") {
    val t = sampleTable()
    val out = tmp("delta_exp")
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)

    // structural: single version-0 JSON commit with protocol, metaData, adds
    val log = Paths.get(out, "_delta_log", "0" * 20 + ".json")
    assert(Files.isRegularFile(log))
    val lines = Files.readAllLines(log).asScala
    assert(lines.exists(_.contains("\"protocol\"")))
    assert(lines.exists(_.contains("\"minReaderVersion\":1")))
    assert(lines.exists(_.contains("\"schemaString\"")))
    val addCount = lines.count(_.contains("\"add\""))
    val parquetOnDisk = Files.list(Paths.get(out)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(addCount == parquetOnDisk && addCount > 0,
      s"every data file must be added exactly once ($addCount adds, $parquetOnDisk files)")

    // content: readDelta == TxTable.read
    val got = DeltaInterop.readDelta(spark, out).orderBy("id").collect()
    val want = t.read().orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("export is deterministic and re-export replaces the previous snapshot") {
    val t = sampleTable()
    val out = tmp("delta_det")
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)
    val first = Files.readAllLines(Paths.get(out, "_delta_log", "0" * 20 + ".json")).asScala.toSeq
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)
    val second = Files.readAllLines(Paths.get(out, "_delta_log", "0" * 20 + ".json")).asScala.toSeq
    assert(first == second, "same snapshot + same ts must export byte-identically")
    // mutate, re-export: reader sees the new snapshot only
    t.append(Seq((9L, "z", 90.0)).toDF("id", "k", "v"), tsMillis = 3000L)
    DeltaInterop.exportDelta(t, out, tsMillis = 6000L)
    assert(DeltaInterop.readDelta(spark, out).count() == t.read().count())
  }

  test("partitioned export: partitionValues recorded and restored (incl. null partition)") {
    val t = TxTable(spark, tmp("delta_part"))
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (3L, null, 3.0))
      .toDF("id", "day", "v")
    t.append(df, tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("delta_part_exp")
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)

    val log = Files.readAllLines(Paths.get(out, "_delta_log", "0" * 20 + ".json")).asScala
    assert(log.exists(_.contains("\"partitionColumns\":[\"day\"]")))
    assert(log.exists(_.contains("\"partitionValues\":{\"day\":\"2024-01-01\"}")))
    assert(log.exists(_.contains("\"partitionValues\":{\"day\":null}")),
      "the null-day file must record a null partition value")

    val got = DeltaInterop.readDelta(spark, out)
    // readDelta follows the metaData schema order (the Delta contract: the
    // logical schema, partition cols in their declared positions) — the
    // original append order, NOT Spark's partition-cols-last read order
    assert(got.columns.toSeq == Seq("id", "day", "v"))
    assert(got.columns.toSet == t.read().columns.toSet)
    val rows = got.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("day")).toSeq == Seq("2024-01-01", "2024-01-02", null))
    assert(rows.map(_.getAs[Double]("v")).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("literal '+' in partition values survives the round trip (no form-decoding)") {
    // Hive dir names leave '+' unescaped and delta-spark leaves it
    // unencoded in add.path — URLDecoder-style form decoding would turn
    // it into a space and corrupt both the path and the recorded value
    val t = TxTable(spark, tmp("delta_plus"))
    t.append(Seq((1L, "a+b", 1.0), (2L, "c d", 2.0)).toDF("id", "day", "v"),
      tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("delta_plus_exp")
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)
    val log = Files.readAllLines(Paths.get(out, "_delta_log", "0" * 20 + ".json")).asScala
    assert(log.exists(_.contains("\"partitionValues\":{\"day\":\"a+b\"}")),
      s"'+' must stay literal in partitionValues: ${log.filter(_.contains("add")).mkString("\n")}")
    val got = DeltaInterop.readDelta(spark, out).orderBy("id").collect()
    assert(got.map(_.getAs[String]("day")).toSeq == Seq("a+b", "c d"))
  }

  test("foreign log: multi-commit add/remove replay with URI-encoded paths") {
    // hand-written log, as another engine would produce it — no TxTable
    val root = Paths.get(tmp("delta_foreign"))
    val logDir = root.resolve("_delta_log"); Files.createDirectories(logDir)
    Seq((1L, "x"), (2L, "y")).toDF("id", "s").coalesce(1)
      .write.parquet(root.resolve("d one").toString) // space → URI-encoded path
    Seq((3L, "z")).toDF("id", "s").coalesce(1)
      .write.parquet(root.resolve("d2").toString)
    def firstParquet(dir: String): String = {
      val s = Files.list(root.resolve(dir))
      try dir + "/" + s.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.getFileName.toString
      finally s.close()
    }
    val f1 = firstParquet("d one")
    val f2 = firstParquet("d2")
    val schemaJson = Seq((1L, "x")).toDF("id", "s").schema.json
      .replace("\"", "\\\"")
    Files.write(logDir.resolve("0" * 20 + ".json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t1","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"${f1.replace("d one", "d%20one")}","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    ).asJava)
    Files.write(logDir.resolve("0" * 19 + "1.json"), Seq(
      s"""{"add":{"path":"$f2","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}""",
      s"""{"remove":{"path":"${f1.replace("d one", "d%20one")}","dataChange":true}}"""
    ).asJava)

    val got = DeltaInterop.readDelta(spark, root.toString).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L), "v1 removed the first file")
  }

  test("parquet checkpoint: _last_checkpoint base plus JSON tail") {
    val root = Paths.get(tmp("delta_ckpt"))
    val logDir = root.resolve("_delta_log"); Files.createDirectories(logDir)
    Seq((1L, 1.5)).toDF("id", "v").coalesce(1).write.parquet(root.resolve("p0").toString)
    Seq((2L, 2.5)).toDF("id", "v").coalesce(1).write.parquet(root.resolve("p1").toString)
    def firstParquet(dir: String): String = {
      val s = Files.list(root.resolve(dir))
      try dir + "/" + s.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.getFileName.toString
      finally s.close()
    }
    val schemaJson = Seq((1L, 1.5)).toDF("id", "v").schema.json

    // checkpoint at version 3 holding protocol + metaData + one add
    val ckptRows = Seq(
      (Some((1, 2)), Option.empty[(String, Map[String, String])], Some((schemaJson, Seq.empty[String]))),
      (None, Some((firstParquet("p0"), Map.empty[String, String])), None))
      .toDF("protocol_t", "add_t", "meta_t")
      .select(
        col("protocol_t").cast("struct<minReaderVersion:int,minWriterVersion:int>").as("protocol"),
        col("add_t").cast("struct<path:string,partitionValues:map<string,string>>").as("add"),
        col("meta_t").cast("struct<schemaString:string,partitionColumns:array<string>>").as("metaData"))
    val ckptTmp = tmp("ckpt_stage")
    ckptRows.coalesce(1).write.mode("overwrite").parquet(ckptTmp)
    val part = Files.list(Paths.get(ckptTmp))
    val src = try part.iterator().asScala.find(_.toString.endsWith(".parquet")).get finally part.close()
    Files.copy(src, logDir.resolve("0" * 19 + "3.checkpoint.parquet"))
    Files.write(logDir.resolve("_last_checkpoint"), Seq("""{"version":3,"size":2}""").asJava)
    // JSON tail: version 4 adds the second file
    Files.write(logDir.resolve("0" * 19 + "4.json"), Seq(
      s"""{"add":{"path":"${firstParquet("p1")}","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""
    ).asJava)

    val got = DeltaInterop.readDelta(spark, root.toString).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L), "checkpoint base + tail add")
  }

  test("unsupported tables fail loudly: column mapping, deletion vectors, high reader version") {
    def foreign(actions: Seq[String]): String = {
      val root = Paths.get(tmp("delta_bad"))
      val logDir = root.resolve("_delta_log"); Files.createDirectories(logDir)
      Files.write(logDir.resolve("0" * 20 + ".json"), actions.asJava)
      root.toString
    }
    val schemaJson = Seq((1L, "x")).toDF("id", "s").schema.json.replace("\"", "\\\"")
    val meta = s""""id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[]"""

    val cm = foreign(Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{$meta,"configuration":{"delta.columnMapping.mode":"name"}}}"""))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.readDelta(spark, cm)).getMessage.contains("column mapping"))

    val dv = foreign(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{$meta,"configuration":{}}}""",
      """{"add":{"path":"x.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"a","offset":1,"sizeInBytes":1,"cardinality":1}}}"""))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.readDelta(spark, dv)).getMessage.contains("deletion vectors"))

    val hi = foreign(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{$meta,"configuration":{}}}"""))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.readDelta(spark, hi)).getMessage.contains("reader features"))

    // benign v3 features pass
    val ok = foreign(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"]}}""",
      s"""{"metaData":{$meta,"configuration":{}}}"""))
    assert(DeltaInterop.readDelta(spark, ok).count() == 0L) // no adds: empty table
  }

  test("versionAsOf time-travels a foreign log; gapless-replay guard fires on cleaned logs") {
    val root = Paths.get(tmp("delta_tt"))
    val logDir = root.resolve("_delta_log"); Files.createDirectories(logDir)
    Seq((1L, "x")).toDF("id", "s").coalesce(1).write.parquet(root.resolve("d0").toString)
    Seq((2L, "y")).toDF("id", "s").coalesce(1).write.parquet(root.resolve("d1").toString)
    def firstParquet(dir: String): String = {
      val s = Files.list(root.resolve(dir))
      try dir + "/" + s.iterator().asScala
        .find(_.toString.endsWith(".parquet")).get.getFileName.toString
      finally s.close()
    }
    val schemaJson = Seq((1L, "x")).toDF("id", "s").schema.json.replace("\"", "\\\"")
    Files.write(logDir.resolve("0" * 20 + ".json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"${firstParquet("d0")}","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    ).asJava)
    Files.write(logDir.resolve("0" * 19 + "1.json"), Seq(
      s"""{"add":{"path":"${firstParquet("d1")}","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""
    ).asJava)

    assert(DeltaInterop.readDelta(spark, root.toString).count() == 2L)
    assert(DeltaInterop.readDelta(spark, root.toString, versionAsOf = Some(0L))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.readDelta(spark, root.toString, versionAsOf = Some(7L)))
      .getMessage.contains("does not exist"))
    // simulate log retention cleaning commit 0: replay has a gap -> loud
    Files.delete(logDir.resolve("0" * 20 + ".json"))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.readDelta(spark, root.toString)).getMessage.contains("gaps"))
  }

  test("FeatureStore.exportDelta hands the whole persisted store to external engines") {
    import graft.store._
    val now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val fs = new FeatureStore(spark)
    val Right(f) = fs.registerFeature("hr", "1.0.0",
      FeatureSchemaMeta("hr", "float64", entity_type = "patient"),
      FeatureSourceMeta("batch"), "o", now)
    fs.activateFeature(f.feature_id, now)
    val df = Seq(("p1", "hr", Some(70.0), ts("2024-01-01 00:00:00")))
      .toDF("entity_id", "feature_name", "value_double", "event_timestamp")
      .withColumn("value_string", lit(null).cast("string"))
    fs.ingestValues(df, Map("hr" -> f.feature_id), now)
    val txPath = tmp("fs_tx")
    fs.saveTx(txPath, tsMillis = 1000L)
    val out = tmp("fs_delta")
    FeatureStore.exportDelta(spark, txPath, out, tsMillis = 5000L)
    for (t <- Seq("registry", "feature_values", "audit_log")) {
      assert(Files.isRegularFile(Paths.get(out, t, "_delta_log", "0" * 20 + ".json")), t)
      assert(DeltaInterop.readDelta(spark, s"$out/$t").count() ==
        graft.sources.TxTable(spark, s"$txPath/$t").read().count(), t)
    }
  }

  test("export hard-links data files when source and target share a filesystem") {
    val t = sampleTable()
    val out = tmp("delta_link")
    DeltaInterop.exportDelta(t, out, tsMillis = 5000L)
    val exported = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(exported.nonEmpty)
    // hard link: link count of the exported file is >= 2 (same inode as source)
    val linkCount = Files.getAttribute(exported.head, "unix:nlink").asInstanceOf[Int]
    assert(linkCount >= 2, s"expected a hard link, got nlink=$linkCount (copy fallback?)")
  }
}
