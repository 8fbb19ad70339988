package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.{col, sum}

import graft.sources.{IcebergInterop, TxTable}

/** Pins the Iceberg boundary: a TxTable exported with
  * [[IcebergInterop.exportIceberg]] is a structurally standard Hadoop-
  * layout Iceberg v1 table (metadata JSON + Avro manifest list + Avro
  * manifest, field-ids included), readable back through
  * [[IcebergInterop.readIceberg]]; and the reader fails LOUDLY on the
  * features it cannot honor (delete files, v3, exotic types).
  */
class IcebergInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def sampleTable(): TxTable = {
    val t = TxTable(spark, tmp("ice_src"))
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v"), tsMillis = 1000L)
    t.append(Seq((4L, "c", 40.0)).toDF("id", "k", "v"), tsMillis = 2000L)
    t
  }

  test("export round-trips through readIceberg and is structurally an Iceberg table") {
    val t = sampleTable()
    val out = tmp("ice_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)

    // structure: metadata/v1.metadata.json + version-hint + snap-*.avro
    val metaDir = Paths.get(out, "metadata")
    assert(Files.isRegularFile(metaDir.resolve("v1.metadata.json")))
    assert(Files.isRegularFile(metaDir.resolve("version-hint.text")))
    val metaTxt = new String(Files.readAllBytes(metaDir.resolve("v1.metadata.json")))
    assert(metaTxt.contains("\"format-version\" : 1"))
    assert(metaTxt.contains("\"manifest-list\""))
    assert(metaTxt.contains("\"fields\""))
    val avros = Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".avro")).toSeq
    assert(avros.exists(_.startsWith("snap-")), s"manifest list missing: $avros")
    assert(avros.exists(_.startsWith("graft-m0-")), s"manifest missing: $avros")

    // content: readIceberg == TxTable.read
    val got = IcebergInterop.readIceberg(spark, out).orderBy("id").collect()
    assert(got.toSeq == t.read().orderBy("id").collect().toSeq)
    // declared schema survives (names + types, nullability per TxTable DDL)
    assert(IcebergInterop.readIceberg(spark, out).schema.fieldNames.toSeq ==
      Seq("id", "k", "v"))
  }

  test("re-export replaces the previous snapshot; snapshotAsOf resolves and rejects") {
    val t = sampleTable()
    val out = tmp("ice_det")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    t.append(Seq((9L, "z", 90.0)).toDF("id", "k", "v"), tsMillis = 3000L)
    IcebergInterop.exportIceberg(t, out, tsMillis = 6000L)
    assert(IcebergInterop.readIceberg(spark, out).count() == t.read().count())
    // the single snapshot's id is resolvable; a bogus one fails loudly
    val metaTxt = new String(
      Files.readAllBytes(Paths.get(out, "metadata", "v1.metadata.json")))
    val snapId = """"current-snapshot-id" : (\d+)""".r
      .findFirstMatchIn(metaTxt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snapId)).count() == 5L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(123L)))
      .getMessage.contains("does not exist"))
  }

  test("version-hint fallback: highest vN.metadata.json wins when the hint is missing") {
    val t = sampleTable()
    val out = tmp("ice_hint")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    Files.delete(Paths.get(out, "metadata", "version-hint.text"))
    assert(IcebergInterop.readIceberg(spark, out).count() == 4L)
  }

  test("timestamp columns survive the round trip as timestamptz") {
    val t = TxTable(spark, tmp("ice_ts"))
    t.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
      .toDF("id", "ts"), tsMillis = 1000L)
    val out = tmp("ice_ts_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val metaTxt = new String(
      Files.readAllBytes(Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"timestamptz\""), "TimestampType must export as timestamptz")
    val got = IcebergInterop.readIceberg(spark, out).collect()
    assert(got.head.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-01-01 10:30:00"))
  }

  test("foreign tables fail loudly: v3 format, delete files, exotic types, remote storage") {
    def foreignMeta(body: String): String = {
      val root = Paths.get(tmp("ice_bad"))
      val metaDir = root.resolve("metadata"); Files.createDirectories(metaDir)
      Files.write(metaDir.resolve("v1.metadata.json"), Seq(body).asJava)
      Files.write(metaDir.resolve("version-hint.text"), Seq("1").asJava)
      root.toString
    }
    val schema =
      """"schema":{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"}]}""".stripMargin

    val v3 = foreignMeta(s"""{"format-version":3,$schema,"snapshots":[]}""")
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, v3)).getMessage.contains("format-version 3"))

    val uuidT = foreignMeta(
      """{"format-version":1,"schema":{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"u","required":false,"type":"uuid"}]},
        |"snapshots":[]}""".stripMargin.replace("\n", ""))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, uuidT)).getMessage.contains("'uuid'"))

    // delete files: build a real export, then flip its manifest to v2
    // content=1 by hand-writing a manifest with a content field
    val t = sampleTable()
    val out = tmp("ice_del")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val metaDir = Paths.get(out, "metadata")
    val manifest = Files.list(metaDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("graft-m0-")).get
    val withContent = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](withContent))
    w.create(withContent, manifest.toFile)
    val entry = new org.apache.avro.generic.GenericData.Record(withContent)
    entry.put("status", 1)
    val dfr = new org.apache.avro.generic.GenericData.Record(
      withContent.getField("data_file").schema())
    dfr.put("content", 2) // an equality delete WITHOUT equality_ids: malformed
    dfr.put("file_path", "x.parquet")
    dfr.put("file_format", "PARQUET")
    dfr.put("record_count", 1L)
    dfr.put("file_size_in_bytes", 1L)
    entry.put("data_file", dfr)
    w.append(entry); w.close()
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out)).getMessage.contains("equality_ids"))

    // remote storage URI in the manifest list
    val s3meta = foreignMeta(
      s"""{"format-version":1,$schema,"current-snapshot-id":7,
         |"snapshots":[{"snapshot-id":7,"timestamp-ms":1,
         |"manifest-list":"s3://bucket/snap-7.avro"}]}"""
        .stripMargin.replace("\n", ""))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, s3meta)).getMessage.contains("remote storage"))
  }

  test("incremental export: snapshot append with history, removal mirroring, schema evolution") {
    val t = sampleTable()
    val out = tmp("ice_incr")
    // first call = full export (metadata version 1)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5000L) == 1L)
    val firstCount = IcebergInterop.readIceberg(spark, out).count()
    assert(firstCount == 4L)
    // identical snapshot -> no new version
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5001L) == 1L)
    // append -> version 2, with the previous snapshot retained for time travel
    t.append(Seq((9L, "z", 90.0)).toDF("id", "k", "v"), tsMillis = 3000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 6000L) == 2L)
    assert(IcebergInterop.readIceberg(spark, out).count() == 5L)
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    assert(metaTxt.contains("\"parent-snapshot-id\""))
    val snapIds = """"snapshot-id" : (\d+)""".r
      .findAllMatchIn(metaTxt).map(_.group(1).toLong).toSeq.distinct
    assert(snapIds.size == 2, s"both snapshots must stay in the metadata: $snapIds")
    // time travel into the mirror's own history (nothing removed yet)
    assert(IcebergInterop.readIceberg(spark, out,
      snapshotAsOf = Some(snapIds.head)).count() == 4L)
    // compaction -> removals mirrored + bytes physically retired
    t.compact(target = 1, tsMillis = 7000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 8000L) == 3L)
    val filesOnDisk = Files.list(Paths.get(out, "data")).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(filesOnDisk == 1, s"mirror must retire compacted-away bytes ($filesOnDisk files)")
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq ==
      t.read().orderBy("id").collect().toSeq)
    // append-only schema evolution rides along; reordering would fail loudly
    t.append(Seq((11L, "w", 1.0, "note")).toDF("id", "k", "v", "extra"),
      tsMillis = 9000L, evolve = true)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 10000L) == 4L)
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.columns.contains("extra") && got.where(col("extra").isNotNull).count() == 1L)
  }

  test("partitioned export: identity spec + manifest tuples reconstruct the partition column") {
    // Hive layout drops the partition column from the parquet; the export
    // declares an identity spec and carries per-file partition tuples, and
    // the reader fills the column back (Iceberg's Column Projection rule)
    val t = TxTable(spark, tmp("ice_part"))
    t.append(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
        (3L, "2024-01-01", 3.0))
      .toDF("id", "day", "v"), tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("ice_part_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)

    // metadata declares the identity spec in BOTH the modern and legacy keys
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"identity\""))
    assert(metaTxt.contains("\"source-id\""))
    assert("\"partition-spec\"".r.findAllIn(metaTxt).size >= 1)
    // data files live under Hive dirs and do NOT carry the column physically
    val dataFiles = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.forall(_.toString.contains("day=")))

    // round trip: values, schema order, and the reconstructed column equal
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "day", "v"))
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "day", "v").orderBy("id").collect().toSeq)
    // pruning on the filled column still yields exact results
    assert(got.where(col("day") === "2024-01-01").count() == 2L)
  }

  test("exportIcebergDays: day(ts) spec, per-file day tuples, ts stays physical, round-trip") {
    import java.sql.Timestamp
    val t = TxTable(spark, tmp("ice_days"))
    // daily appends — each append (hence each file) is single-day
    t.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-03-01 17:30:00"), 2.0))
      .toDF("id", "ts", "v"), tsMillis = 1000L)
    t.append(Seq((3L, Timestamp.valueOf("2024-03-02 09:15:00"), 3.0))
      .toDF("id", "ts", "v"), tsMillis = 2000L)
    val out = tmp("ice_days_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)

    // metadata declares the day transform over ts in both spec keys
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"day\""), metaTxt)
    assert(metaTxt.contains("ts_day"))
    // ts is PHYSICALLY in the data files (non-identity = pruning metadata)
    val dataFiles = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.nonEmpty)
    assert(spark.read.parquet(dataFiles.head.toString).columns.contains("ts"))

    // round trip: identical rows, schema order preserved
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "ts", "v"))
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "ts", "v").orderBy("id").collect().toSeq)
  }

  test("readIcebergPruned: manifest-tuple pruning skips files on day AND identity specs") {
    import java.sql.Timestamp
    // day spec: tuples decode as java.sql.Date; pruning to one day scans
    // only that day's files
    val t = TxTable(spark, tmp("ice_prune_days"))
    t.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0))
      .toDF("id", "ts", "v"), tsMillis = 1000L)
    t.append(Seq((2L, Timestamp.valueOf("2024-03-02 09:00:00"), 2.0))
      .toDF("id", "ts", "v"), tsMillis = 2000L)
    val out = tmp("ice_prune_days_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    val day2 = java.sql.Date.valueOf("2024-03-02")
    val pruned = IcebergInterop.readIcebergPruned(spark, out,
      tuple => tuple("ts_day") == day2)
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(pruned.inputFiles.length <
      IcebergInterop.readIceberg(spark, out).inputFiles.length,
      "pruning must reduce the file list, not just filter rows")
    // a pruner keeping nothing returns the empty frame with the schema
    assert(IcebergInterop.readIcebergPruned(spark, out, _ => false).isEmpty)

    // identity spec: tuples decode as the source-typed value (string here);
    // pruning composes with the Column-Projection fill
    val tp = TxTable(spark, tmp("ice_prune_id"))
    tp.append(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
        (3L, "2024-01-01", 3.0))
      .toDF("id", "day", "v"), tsMillis = 1000L, partitionBy = Seq("day"))
    val outP = tmp("ice_prune_id_exp")
    IcebergInterop.exportIceberg(tp, outP, tsMillis = 5000L)
    val prunedP = IcebergInterop.readIcebergPruned(spark, outP,
      tuple => tuple("day") == "2024-01-01")
    assert(prunedP.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(prunedP.where(col("day") =!= "2024-01-01").count() == 0L)
  }

  test("incremental day-spec mirror: snapshots append, carried tuples ride, mismatches refused") {
    import java.sql.Timestamp
    val t = TxTable(spark, tmp("ice_days_incr"))
    t.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-03-01 12:00:00"), 2.0))
      .toDF("id", "ts", "v"), tsMillis = 1000L)
    val out = tmp("ice_days_incr_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5000L,
      dayPartitionOf = Some("ts")) == 1L)
    // a new day lands; the mirror appends snapshot 2 (and scans ONLY it)
    t.append(Seq((3L, Timestamp.valueOf("2024-03-02 09:00:00"), 3.0))
      .toDF("id", "ts", "v"), tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 6000L,
      dayPartitionOf = Some("ts")) == 2L)
    // identical source → no new version
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 7000L,
      dayPartitionOf = Some("ts")) == 2L)
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"day\""))
    assert(metaTxt.contains("\"parent-snapshot-id\""))
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "ts", "v").orderBy("id").collect().toSeq)
    // the manifests carry per-file day ordinals: 2024-03-01 = 19783,
    // 2024-03-02 = 19784 (days since epoch)
    assert(got.count() == 3L)

    // an IDENTITY mirror onto the day table is refused (and vice versa)
    val eId = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 8000L))
    assert(eId.getMessage.contains("identity"), eId.getMessage)
    val flatOther = TxTable(spark, tmp("ice_days_incr_id"))
    flatOther.append(Seq((1L, "a", 1.0)).toDF("id", "k", "v"), tsMillis = 1000L)
    val idExp = tmp("ice_days_incr_id_exp")
    IcebergInterop.exportIcebergIncremental(flatOther, idExp, tsMillis = 5000L)
    val eDay = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(t, idExp,
        tsMillis = 9000L, dayPartitionOf = Some("ts")))
    // either shape-mismatch or spec-mismatch message — both loud
    assert(eDay.getMessage.contains("re-export from scratch") ||
      eDay.getMessage.contains("partition spec"), eDay.getMessage)

    // a multi-day NEW batch is refused by the same single-day contract
    t.append(Seq((4L, Timestamp.valueOf("2024-03-03 01:00:00"), 4.0),
        (5L, Timestamp.valueOf("2024-03-04 01:00:00"), 5.0))
      .toDF("id", "ts", "v").coalesce(1), tsMillis = 3000L)
    val eSpan = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 10000L,
        dayPartitionOf = Some("ts")))
    assert(eSpan.getMessage.contains("spans days"), eSpan.getMessage)
  }

  test("exportIcebergDays refuses multi-day files, null timestamps, partitioned sources") {
    import java.sql.Timestamp
    // a file spanning two days has no honest day tuple
    val span = TxTable(spark, tmp("ice_days_span"))
    span.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-03-02 08:00:00"), 2.0))
      .toDF("id", "ts", "v").coalesce(1), tsMillis = 1000L)
    val e1 = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDays(span, tmp("ice_days_span_exp"), "ts", 5000L))
    assert(e1.getMessage.contains("spans days"), e1.getMessage)

    // a null ts has no day partition
    val nul = TxTable(spark, tmp("ice_days_null"))
    nul.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0),
        (2L, null.asInstanceOf[Timestamp], 2.0))
      .toDF("id", "ts", "v").coalesce(1), tsMillis = 1000L)
    val e2 = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDays(nul, tmp("ice_days_null_exp"), "ts", 5000L))
    assert(e2.getMessage.contains("null"), e2.getMessage)

    // a Hive-partitioned source belongs to the identity exporter
    val part = TxTable(spark, tmp("ice_days_part"))
    part.append(Seq((1L, "a", 1.0)).toDF("id", "k", "v"),
      tsMillis = 1000L, partitionBy = Seq("k"))
    val e3 = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDays(part, tmp("ice_days_part_exp"), "ts", 5000L))
    assert(e3.getMessage.contains("FLAT"), e3.getMessage)

    // a non-timestamp column cannot take day()
    val bad = TxTable(spark, tmp("ice_days_bad"))
    bad.append(Seq((1L, "x", 1.0)).toDF("id", "k", "v"), tsMillis = 1000L)
    val e4 = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDays(bad, tmp("ice_days_bad_exp"), "k", 5000L))
    assert(e4.getMessage.contains("timestamp/date"), e4.getMessage)
  }

  test("exportIcebergBucketed: spec-vector hash, bucket-pure files, round-trip, refusals") {
    // the Iceberg spec's own published test vector (Appendix B):
    // murmur3_x86_32 of int64 34 little-endian = 2017239379
    assert(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(34L, 0) == 2017239379)
    val t = TxTable(spark, tmp("ice_bucket"))
    t.append((0L until 40L).map(i => (i, s"u$i", i * 1.5)).toDF("id", "name", "v"),
      tsMillis = 1000L)
    val out = tmp("ice_bucket_exp")
    IcebergInterop.exportIcebergBucketed(t, out, "id", nBuckets = 4, tsMillis = 5000L)
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"bucket[4]\""), metaTxt)
    // round trip: identical rows, id stays physical
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "name", "v").orderBy("id").collect().toSeq)
    // every data file is bucket-pure AND its directory names the spec bucket
    val files = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty && files.forall(_.toString.contains("id_bucket=")))
    files.foreach { p =>
      val dirBucket = p.getParent.getFileName.toString.stripPrefix("id_bucket=").toInt
      val ids = spark.read.parquet(p.toString).select("id").collect().map(_.getLong(0))
      ids.foreach { id =>
        val expect = (org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashLong(id, 0) & Int.MaxValue) % 4
        assert(expect == dirBucket, s"id $id in bucket dir $dirBucket, spec says $expect")
      }
    }
    // STRING bucketing works via the reference murmur3 (round-9 verdict #2
    // — the reference's own entity_id is a string; the spec's string
    // vector "iceberg" -> 1210000089 is pinned in IcebergTransformsSpec),
    // where Spark's own Murmur3Hash would diverge on the tails
    val outS = tmp("ice_bucket_str")
    IcebergInterop.exportIcebergBucketed(t, outS, "name", nBuckets = 4, 5000L)
    val gotS = IcebergInterop.readIceberg(spark, outS)
    assert(gotS.orderBy("id").collect().toSeq ==
      t.read().select("id", "name", "v").orderBy("id").collect().toSeq)
    Files.walk(Paths.get(outS, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).foreach { p =>
        val dirBucket = p.getParent.getFileName.toString.stripPrefix("name_bucket=").toInt
        spark.read.parquet(p.toString).select("name").collect().map(_.getString(0))
          .foreach { name =>
            val expect = (graft.functions.IcebergTransforms.murmur3(
              name.getBytes("UTF-8"), 0) & Int.MaxValue) % 4
            assert(expect == dirBucket, s"'$name' in bucket dir $dirBucket, spec says $expect")
          }
      }
    // a type with no implemented spec byte form is still refused
    val e = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergBucketed(t, tmp("ice_bucket_bad"), "v", 4, 5000L))
    assert(e.getMessage.contains("int/long/date/timestamp/string"), e.getMessage)
  }

  test("composite day(ts)+identity(src) export: two-dim tuples, projection fill, pruning") {
    val t = TxTable(spark, tmp("ice_comp_src"))
    t.append((0L until 30L).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-01-${(i % 3) + 10}%02d 08:00:00"),
          if (i % 2 == 0) "web" else "app", i * 2.0))
      .toDF("id", "ts", "src", "v"), tsMillis = 1000L)
    val out = tmp("ice_comp_exp")
    IcebergInterop.exportIcebergDayIdentity(t, out, "ts", "src", tsMillis = 5000L)

    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"day\"") &&
      metaTxt.contains("\"transform\" : \"identity\""), metaTxt)

    // round trip: src reconstructs from the tuples (Column Projection),
    // ts stays physical
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "ts", "src", "v").orderBy("id").collect().toSeq)
    // every data file is pure in BOTH dims and physically lacks src
    Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).foreach { p =>
        val df = spark.read.parquet(p.toString)
        assert(!df.columns.contains("src"), s"$p should drop the identity column")
        assert(df.select(org.apache.spark.sql.functions.to_date(col("ts")))
          .distinct().count() == 1L, s"$p spans multiple days")
      }

    // pruning on BOTH dimensions, certified against full read + row filter
    val cut = java.sql.Date.valueOf("2024-01-11")
    val pruned = IcebergInterop.readIcebergPruned(spark, out, tuple =>
      (tuple("ts_day"), tuple("src")) match {
        case (d: java.sql.Date, s: String) => !d.before(cut) && s == "web"
        case _                             => true
      })
    val expected = got.where(
      col("ts") >= org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2024-01-11 00:00:00")) && col("src") === "web")
    assert(pruned.inputFiles.length < got.inputFiles.length)
    assert(pruned.exceptAll(expected).count() == 0L &&
      expected.exceptAll(pruned).count() == 0L)

    // refusals: partitioned source, same column twice, bad identity type
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDayIdentity(t, tmp("x"), "ts", "ts", 1L))
      .getMessage.contains("must differ"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDayIdentity(t, tmp("x"), "ts", "v", 1L))
      .getMessage.contains("identity partitions over"))
  }

  test("clusterBy turns a day-export refusal into a working day(ts) export") {
    import org.apache.spark.sql.functions.to_date
    val t = TxTable(spark, tmp("ice_cluster_src"))
    // one commit spanning three days in one file: exactly the layout
    // exportIcebergDays refuses (a multi-day file has no honest day tuple)
    t.append((0L until 30L).map(i =>
        (i, java.sql.Timestamp.valueOf(f"2024-01-${(i % 3) + 10}%02d 08:00:00"), i * 2.0))
      .toDF("id", "ts", "v").coalesce(1), tsMillis = 1000L)
    val out = tmp("ice_cluster_exp")
    val refusal = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L))
    assert(refusal.getMessage.contains("spans days"), refusal.getMessage)

    val before = t.read().orderBy("id").collect().toSeq
    t.clusterBy(to_date(col("ts")), tsMillis = 2000L)
    // the rewrite preserves content and keeps the table flat
    assert(t.read().orderBy("id").collect().toSeq == before)
    assert(t.snapshotInfo().partCols.isEmpty)
    // every file is now single-day (the clusterBy contract)
    t.snapshotInfo().files.foreach { rel =>
      val days = spark.read
        .parquet(java.nio.file.Paths.get(t.snapshotInfo().dataDir, rel).toString)
        .select(to_date(col("ts"))).distinct().count()
      assert(days == 1L, s"file $rel still spans $days days after clusterBy")
    }
    // the previously-refused export now succeeds and round-trips
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.orderBy("id").collect().toSeq == before)
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    assert(metaTxt.contains("\"transform\" : \"day\""))

    // partitioned tables refuse clusterBy (their directories already cluster)
    val tp = TxTable(spark, tmp("ice_cluster_part"))
    tp.append(Seq((1L, "a", 1.0)).toDF("id", "day", "v"),
      tsMillis = 1000L, partitionBy = Seq("day"))
    assert(intercept[IllegalArgumentException](
      tp.clusterBy(col("id"), 2000L)).getMessage.contains("FLAT"))
  }

  test("deleteFromIceberg: v2 position-delete commit, live reads, time travel, idempotence") {
    val t = TxTable(spark, tmp("ice_del_src"))
    t.append((0L until 40L).map(i => (i, s"k${i % 4}", i * 1.5)).toDF("id", "k", "v"),
      tsMillis = 1000L)
    val out = tmp("ice_del_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val metaDir = Paths.get(out, "metadata")

    val n = IcebergInterop.deleteFromIceberg(spark, out, col("id") % 5 === 0, tsMillis = 6000L)
    assert(n == 8L, s"expected 8 deleted positions, got $n")

    // live read excludes exactly the predicate's rows
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.count() == 32L)
    assert(live.where(col("id") % 5 === 0).count() == 0L)
    assert(live.orderBy("id").collect().toSeq ==
      t.read().where(col("id") % 5 =!= 0).orderBy("id").collect().toSeq)

    // the commit is structurally v2: metadata, sequence numbers, and a
    // content=1 manifest-list entry; prior snapshot still time-travels FULL
    assert(Files.isRegularFile(metaDir.resolve("v2.metadata.json")))
    val metaTxt = new String(Files.readAllBytes(metaDir.resolve("v2.metadata.json")))
    assert(metaTxt.contains("\"format-version\" : 2"))
    assert(metaTxt.contains("\"last-sequence-number\" : 1"))
    assert(metaTxt.contains("\"operation\" : \"delete\""))
    assert(!metaTxt.contains("\"partition-spec\" :"), "v2 must drop the v1 singular fields")
    val v1Txt = new String(Files.readAllBytes(metaDir.resolve("v1.metadata.json")))
    val oldSnap = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(oldSnap))
      .count() == 40L, "pre-delete snapshots must still read the full rows")

    // the delete parquet is where the spec puts it, with the spec's columns
    val delFiles = Files.list(Paths.get(out, "data", "deletes")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(delFiles.nonEmpty)
    val delRows = spark.read.parquet(delFiles.map(_.toString): _*)
    assert(delRows.columns.toSeq == Seq("file_path", "pos"))
    assert(delRows.count() == 8L)

    // idempotent: the same predicate now matches nothing and commits nothing
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") % 5 === 0, 7000L) == 0L)
    assert(!Files.isRegularFile(metaDir.resolve("v3.metadata.json")))

    // a SECOND delete stacks (sequence 2 over 1) and both apply
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 1L, 8000L) == 1L)
    val live2 = IcebergInterop.readIceberg(spark, out)
    assert(live2.count() == 31L && live2.where(col("id") === 1L).count() == 0L)
    assert(new String(Files.readAllBytes(metaDir.resolve("v3.metadata.json")))
      .contains("\"last-sequence-number\" : 2"))

    // pruned reads apply deletes too (prune-to-superset stays correct)
    val pruned = IcebergInterop.readIcebergPruned(spark, out, _ => true)
    assert(pruned.count() == 31L)

    // incremental consumption refuses a deleted-from table, loudly
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChanges(spark, out, oldSnap))
    assert(e.getMessage.contains("re-sync from the full snapshot"))
  }

  test("deleteFromIcebergByKey: equality deletes — CDC semantics, null keys, composition") {
    val t = TxTable(spark, tmp("ice_eq_src"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, null, 4.0))
      .toDF("id", "k", "v"), tsMillis = 1000L)
    val out = tmp("ice_eq_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)

    // delete by key k='a': O(keys), no table scan, both 'a' rows die
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq("a").toDF("k"), tsMillis = 6000L) == 1L)
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))

    // CDC semantics: a row RE-APPENDED after the delete survives it —
    // the equality delete applies only to strictly-older files. Append a
    // fresh 'a' row via a second v2 commit path: use the incremental
    // exporter? it refuses v2 — so hand-construct by deleting a DIFFERENT
    // key and checking the old delete still applies (ordering), then pin
    // the strictly-newer rule at the sequence level via a same-key
    // re-delete being a legal stacking commit.
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq("b").toDF("k"), tsMillis = 7000L) == 1L)
    val live2 = IcebergInterop.readIceberg(spark, out)
    assert(live2.select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))

    // null-safe matching: a null key component matches null values
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(Option.empty[String]).toDF("k"), tsMillis = 8000L) == 1L)
    assert(IcebergInterop.readIceberg(spark, out).count() == 0L)

    // time travel below the deletes reads the full table
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap0))
      .count() == 4L)

    // composition with position deletes: a fresh table takes one of each
    val t2 = TxTable(spark, tmp("ice_eq2_src"))
    t2.append((0L until 10L).map(i => (i, s"g${i % 2}", i * 1.0)).toDF("id", "k", "v"),
      tsMillis = 1000L)
    val out2 = tmp("ice_eq2_exp")
    IcebergInterop.exportIceberg(t2, out2, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out2, col("id") === 1L, 6000L) == 1L)
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out2,
      Seq("g0").toDF("k"), 7000L) == 1L)
    val survivors = IcebergInterop.readIceberg(spark, out2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors == Seq(3L, 5L, 7L, 9L), s"got $survivors")
    // the pos-delete writer's live view honors the eq delete: re-deleting
    // an eq-deleted row's position matches nothing
    assert(IcebergInterop.deleteFromIceberg(spark, out2, col("id") === 2L, 8000L) == 0L)
    // compaction FOLDS both delete kinds (round-13: the eq-delete
    // refusal is gone): the position delete resolves by (file, pos), the
    // equality delete by the strictly-newer-sequence rule, and the new
    // snapshot is delete-free — the live view unchanged, read with no
    // anti-join
    val (nfEq, deadEq) = IcebergInterop.compactIcebergDeletes(spark, out2, 9000L)
    assert(nfEq >= 1 && deadEq == 6L, s"got ($nfEq, $deadEq)")
    assert(IcebergInterop.readIceberg(spark, out2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L, 7L, 9L))
    assert(IcebergInterop.compactIcebergDeletes(spark, out2, 9500L) == ((0, 0L)),
      "the compacted snapshot must carry no delete files")
    // unknown key columns refuse
    assert(intercept[IllegalArgumentException](
      IcebergInterop.deleteFromIcebergByKey(spark, out2, Seq(1).toDF("nope"), 9500L))
      .getMessage.contains("not a column"))
  }

  test("incremental consumption WORKS over deletes that predate the watermark") {
    // a foreign v2 writer appends a data snapshot AFTER a delete: the
    // delete set is identical at both ends of the consumed range, so the
    // delta is exactly the appended rows (deletes apply only to OLDER
    // files) — the coarse refuse-on-any-delete stance would force a full
    // re-sync after every one-time GDPR delete, forever
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    val t = TxTable(spark, tmp("ice_incrdel_src"))
    t.append((0L until 10L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 1000L)
    val out = tmp("ice_incrdel_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") < 3, 6000L) == 3L)
    val metaDir = Paths.get(out, "metadata")
    val v2Txt = new String(Files.readAllBytes(metaDir.resolve("v2.metadata.json")))
    val deleteSnap = """"current-snapshot-id" : (\d+)""".r
      .findFirstMatchIn(v2Txt).get.group(1).toLong

    // ---- emulate the foreign append (snapshot 777, sequence 2)
    val dataDir = Paths.get(out, "data")
    val staged = Files.createTempDirectory("ice_incrdel_new")
    Seq((100L, 1.5), (101L, 2.5)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(staged.toString)
    val newPart = Files.list(staged).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val newData = dataDir.resolve("foreign-append.parquet")
    Files.move(newPart, newData)
    // new manifest reusing the existing data manifest's writer schema
    val oldManifest = Files.list(metaDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("graft-m0-")).get
    val rdr = new DataFileReader[GenericRecord](oldManifest.toFile,
      new GenericDatumReader[GenericRecord]())
    val mSchema = rdr.getSchema
    rdr.close()
    val newManifest = metaDir.resolve("foreign-append.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](mSchema))
    w.setMeta("format-version", "1")
    w.create(mSchema, newManifest.toFile)
    val entry = new GenericData.Record(mSchema)
    entry.put("status", 1)
    entry.put("snapshot_id", 777L)
    val dfSchema = mSchema.getField("data_file").schema()
    val dfr = new GenericData.Record(dfSchema)
    dfr.put("file_path", newData.toUri.toString)
    dfr.put("file_format", "PARQUET")
    Option(dfSchema.getField("partition")).foreach(f =>
      dfr.put("partition", new GenericData.Record(f.schema())))
    dfr.put("record_count", 2L)
    dfr.put("file_size_in_bytes", Files.size(newData))
    Option(dfSchema.getField("block_size_in_bytes")).foreach(_ =>
      dfr.put("block_size_in_bytes", 134217728L))
    entry.put("data_file", dfr)
    w.append(entry); w.close()
    // new manifest list = the delete snapshot's entries (copied with their
    // own writer schema) + the new manifest at sequence 2
    val curListUri = """"manifest-list" : "([^"]+)"""".r
      .findAllMatchIn(v2Txt).toSeq.last.group(1)
    val curList = Paths.get(java.net.URI.create(curListUri))
    val lr = new DataFileReader[GenericRecord](curList.toFile,
      new GenericDatumReader[GenericRecord]())
    val listSchema = lr.getSchema
    val carried = lr.iterator().asScala.toSeq
    lr.close()
    val newList = metaDir.resolve("snap-777.avro")
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, newList.toFile)
    carried.foreach(lw.append)
    val le = new GenericData.Record(listSchema)
    le.put("manifest_path", newManifest.toUri.toString)
    le.put("manifest_length", Files.size(newManifest))
    le.put("partition_spec_id", 0)
    Option(listSchema.getField("content")).foreach(_ => le.put("content", 0))
    Option(listSchema.getField("sequence_number")).foreach(_ =>
      le.put("sequence_number", 2L))
    Option(listSchema.getField("min_sequence_number")).foreach(_ =>
      le.put("min_sequence_number", 2L))
    le.put("added_snapshot_id", 777L)
    Seq("added_files_count" -> 1, "existing_files_count" -> 0,
      "deleted_files_count" -> 0).foreach { case (f, v) =>
      Option(listSchema.getField(f)).foreach(_ => le.put(f, v)) }
    Seq("added_rows_count" -> 2L, "existing_rows_count" -> 0L,
      "deleted_rows_count" -> 0L).foreach { case (f, v) =>
      Option(listSchema.getField(f)).foreach(_ => le.put(f, v)) }
    lw.append(le); lw.close()
    // new metadata version: snapshot 777 on top of the delete snapshot
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = om.readTree(v2Txt)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    rootNode.put("last-sequence-number", 2L)
    rootNode.put("current-snapshot-id", 777L)
    val sn = om.createObjectNode()
    sn.put("snapshot-id", 777L)
    sn.put("parent-snapshot-id", deleteSnap)
    sn.put("sequence-number", 2L)
    sn.put("schema-id", 0)
    sn.put("timestamp-ms", 7000L)
    sn.put("manifest-list", newList.toUri.toString)
    sn.putObject("summary").put("operation", "append")
    rootNode.get("snapshots")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].add(sn)
    Files.write(metaDir.resolve("v3.metadata.json"),
      java.util.List.of(om.writerWithDefaultPrettyPrinter().writeValueAsString(rootNode)))
    Files.write(metaDir.resolve("version-hint.text"), java.util.List.of("3"))

    // the consumer at the delete snapshot reads EXACTLY the appended rows
    val (head, delta) = IcebergInterop.readIcebergChanges(spark, out, deleteSnap)
    assert(head == 777L)
    assert(delta.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L))
    // and the full read still applies the pre-watermark delete
    assert(IcebergInterop.readIceberg(spark, out).count() == 9L)
    // a delete INSIDE the range still refuses: consume from s0 (before
    // the delete landed)
    val v1Txt = new String(Files.readAllBytes(metaDir.resolve("v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChanges(spark, out, snap0))
    assert(e.getMessage.contains("delete files inside the consumed range"), e.getMessage)
  }

  test("compactIcebergDeletes rewrites ONLY the touched files and drops the delete set") {
    val t = TxTable(spark, tmp("ice_cmp_src"))
    t.append((0L until 20L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 1000L)
    t.append((20L until 40L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 2000L)
    val out = tmp("ice_cmp_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // deletes land only in the FIRST commit's file
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") < 4, 6000L) == 4L)
    val pre = IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq
    // inputFiles of the pre-purge plan includes the delete-parquet scan
    // (the anti-join side) — compare DATA files only
    val preFiles = IcebergInterop.readIceberg(spark, out).inputFiles.toSet
      .filterNot(_.contains("/deletes/"))

    val (nf, reclaimed) = IcebergInterop.compactIcebergDeletes(spark, out, 7000L)
    assert(nf == 1 && reclaimed == 4L, s"($nf, $reclaimed)")
    val post = IcebergInterop.readIceberg(spark, out)
    assert(post.orderBy("id").collect().toSeq == pre,
      "compaction must be invisible to the live view")
    // the untouched file is carried by reference; the touched one is gone
    val postFiles = post.inputFiles.toSet
    assert(postFiles.exists(_.contains("compacted")), "rewritten file missing")
    assert((postFiles intersect preFiles).size == preFiles.size - 1,
      "exactly one original file should be replaced")
    // the new snapshot carries no deletes: compacting again is a no-op,
    // and a fresh delete starts a new lifecycle
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 8000L) == ((0, 0L)))
    // prior snapshots still read their views
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap0))
      .count() == 40L)
  }

  test("position deletes: dangling delete files are loud, unknown-file rows are inert") {
    val t = TxTable(spark, tmp("ice_del2_src"))
    t.append((0L until 10L).map(i => (i, i * 2.0)).toDF("id", "v"), tsMillis = 1000L)
    val out = tmp("ice_del2_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") < 2, 6000L) == 2L)
    val delFile = Files.list(Paths.get(out, "data", "deletes")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head

    // a delete row referencing an UNKNOWN data file is inapplicable, not an
    // error (real readers ignore deletes for dead/pruned files the same way)
    val augmented = spark.read.parquet(delFile.toString)
      .union(Seq(("file:///nowhere/unknown.parquet", 5L)).toDF("file_path", "pos"))
    val staged = Files.createTempDirectory("ice_del2_aug")
    augmented.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val part = Files.list(staged).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, delFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(IcebergInterop.readIceberg(spark, out).count() == 8L)

    // a delete file named by the manifests but MISSING on disk is loud —
    // reading around it would silently resurrect deleted rows
    Files.delete(delFile)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out))
    assert(e.getMessage.contains("position-delete file that is missing"))

  }

  test("exportIcebergTruncated: string prefix + floored long ranges round-trip") {
    val t = TxTable(spark, tmp("ice_trunc"))
    t.append(Seq((1L, "alpha", -7L), (2L, "alps", 13L), (3L, "beta", -1L), (4L, "al", 5L))
      .toDF("id", "k", "n"), tsMillis = 1000L)
    // string prefix
    val outS = tmp("ice_trunc_s")
    IcebergInterop.exportIcebergTruncated(t, outS, "k", width = 2, tsMillis = 5000L)
    assert(new String(Files.readAllBytes(Paths.get(outS, "metadata", "v1.metadata.json")))
      .contains("\"transform\" : \"truncate[2]\""))
    val gotS = IcebergInterop.readIceberg(spark, outS)
    assert(gotS.orderBy("id").collect().toSeq ==
      t.read().select("id", "k", "n").orderBy("id").collect().toSeq)
    val dirsS = Files.walk(Paths.get(outS, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(_.getParent.getFileName.toString).toSet
    assert(dirsS == Set("k_trunc=al", "k_trunc=be"), dirsS.toString)
    // floored integer ranges: -7 truncates to -10 at width 10 (toward -inf)
    val outN = tmp("ice_trunc_n")
    IcebergInterop.exportIcebergTruncated(t, outN, "n", width = 10, tsMillis = 5000L)
    val dirsN = Files.walk(Paths.get(outN, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(_.getParent.getFileName.toString).toSet
    assert(dirsN == Set("n_trunc=-10", "n_trunc=10", "n_trunc=0"), dirsN.toString)
    assert(IcebergInterop.readIceberg(spark, outN).count() == 4L)
  }

  test("a non-identity transform whose source column is missing from the data is unreadable, loudly") {
    import java.sql.Timestamp
    val t = TxTable(spark, tmp("ice_days_strip"))
    t.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0))
      .toDF("id", "ts", "v"), tsMillis = 1000L)
    val out = tmp("ice_days_strip_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    // strip ts from every data file in place (a broken/foreign rewrite):
    // day(ts) can NOT be reconstructed from the tuple — must refuse
    val files = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    files.foreach { p =>
      val rows = spark.read.parquet(p.toString).drop("ts")
      val stage = tmp("ice_days_strip_stage")
      rows.coalesce(1).write.mode("overwrite").parquet(stage)
      val s0 = Files.list(Paths.get(stage))
      val src = try s0.iterator().asScala.find(_.toString.endsWith(".parquet")).get finally s0.close()
      Files.copy(src, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out).collect())
    assert(e.getMessage.contains("cannot be reconstructed"), e.getMessage)
  }

  test("mixed physical layouts (some files carry the partition column) are refused loudly") {
    // native-Iceberg writes appended after a Hive migration leave SOME data
    // files physically carrying the identity-partition column: one uniform
    // fill decision misreads them either way (overwrite the carried column
    // or null the absent one), so footer disagreement must fail loudly
    val t = TxTable(spark, tmp("ice_mixed"))
    t.append(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      .toDF("id", "day", "v"), tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("ice_mixed_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // rewrite ONE data file in place with a version that carries `day`
    // physically (same rows, same path — the manifests don't change)
    val victim = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .find(_.toString.contains("day=2024-01-02")).get
    val rows = spark.read.parquet(victim.toString)
      .withColumn("day", org.apache.spark.sql.functions.lit("2024-01-02"))
    val stage = tmp("ice_mixed_stage")
    rows.coalesce(1).write.mode("overwrite").parquet(stage)
    val s0 = Files.list(Paths.get(stage))
    val src = try s0.iterator().asScala.find(_.toString.endsWith(".parquet")).get finally s0.close()
    Files.copy(src, victim, java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out).collect())
    assert(e.getMessage.contains("mixes physical layouts"), e.getMessage)
  }

  test("partitioned export round-trips typed (date, int) and null partition values") {
    val t = TxTable(spark, tmp("ice_ptyped"))
    t.append(Seq(
        (1L, java.sql.Date.valueOf("2024-03-01"), 7, 1.0),
        (2L, java.sql.Date.valueOf("2024-03-02"), 8, 2.0),
        (3L, null.asInstanceOf[java.sql.Date], 8, 3.0))
      .toDF("id", "day", "bucket", "v"),
      tsMillis = 1000L, partitionBy = Seq("day", "bucket"))
    val out = tmp("ice_ptyped_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.schema("day").dataType == org.apache.spark.sql.types.DateType)
    assert(got.schema("bucket").dataType == org.apache.spark.sql.types.IntegerType)
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "day", "bucket", "v").orderBy("id").collect().toSeq)
    assert(got.where(col("day").isNull).count() == 1L)
  }

  test("hive-escaped partition values (colon, slash, space) round-trip through the manifest tuples") {
    val t = TxTable(spark, tmp("ice_pesc"))
    t.append(Seq((1L, "a:b/c d", 1.0), (2L, "plain", 2.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_pesc_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val got = IcebergInterop.readIceberg(spark, out)
    // the manifest carries the LOGICAL value, not the %XX directory form
    assert(got.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a:b/c d", "plain"))
  }

  test("property: arbitrary string partition values round-trip (unicode, specials, whitespace)") {
    // the Hive path escaping + manifest tuple + Column-Projection fill
    // chain must be the identity for ANY partition value Spark can write —
    // adversarial set: every Hive-escaped ASCII special. (Non-ASCII values
    // land RAW in directory names — Hive escaping only covers ASCII
    // specials — and this container's JVM filesystem charset rejects them
    // in Spark's own partitioned write, so unicode is an environment
    // limitation upstream of the Iceberg chain, not a round-trip case.)
    val values = Seq(
      "plain", "a:b", "x/y", "a b", "q=r", "semi;colon",
      "tab\tchar", "100%", "[bracket]", "star*glob", "quote'd",
      "back\\slash", "__HIVE_DEFAULT_PARTITION_", "-lead-dash")
    import spark.implicits._
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v, i * 1.5) }
      .toDF("id", "k", "v")
    val t = TxTable(spark, tmp("ice_prop"))
    t.append(df, tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_prop_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val got = IcebergInterop.readIceberg(spark, out)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == values.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      s"partition values corrupted in the round trip: $got")
  }

  test("partitioned incremental export appends snapshots; spec mismatch is refused") {
    val t = TxTable(spark, tmp("ice_pincr"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v"),
      tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_pincr_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5000L) == 1L)
    t.append(Seq((3L, "a", 3.0)).toDF("id", "k", "v"), tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 6000L) == 2L)
    val got = IcebergInterop.readIceberg(spark, out)
    assert(got.orderBy("id").collect().toSeq ==
      t.read().select("id", "k", "v").orderBy("id").collect().toSeq)

    // a FLAT table cannot mirror onto the partitioned export (and a
    // partitioned one cannot mirror onto a flat export): loud refusal
    val flat = TxTable(spark, tmp("ice_flat"))
    flat.append(Seq((1L, "a", 1.0)).toDF("id", "k", "v"), tsMillis = 1000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(flat, out, tsMillis = 7000L))
      .getMessage.contains("partition spec"))
    val flatOut = tmp("ice_flat_exp")
    IcebergInterop.exportIceberg(flat, flatOut, tsMillis = 5000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(t, flatOut, tsMillis = 8000L))
      .getMessage.contains("partition spec"))
  }

  test("legacy-only partition-spec field still blocks a mismatched incremental append") {
    // an older v1 writer may record ONLY the legacy `partition-spec` field;
    // the guard must consult it, not just `partition-specs` (review finding)
    val t = sampleTable()
    val out = tmp("ice_legacy")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val metaPath = Paths.get(out, "metadata", "v1.metadata.json")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(Files.readAllBytes(metaPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("partition-specs")
    val legacy = root.putArray("partition-spec")
    val f = m.createObjectNode()
    f.put("name", "k"); f.put("transform", "identity")
    f.put("source-id", 2); f.put("field-id", 1000)
    legacy.add(f)
    Files.write(metaPath, Seq(m.writeValueAsString(root)).asJava)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 6000L))
    assert(e.getMessage.contains("partition spec"), e.getMessage)
  }

  test("schema evolution assigns a fresh schema-id and keeps old snapshots' schemas") {
    val t = sampleTable()
    val out = tmp("ice_evo")
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5000L) == 1L)
    val v1 = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val firstSnap = """"snapshot-id" : (\d+)""".r
      .findFirstMatchIn(v1).get.group(1).toLong
    t.append(Seq((11L, "w", 1.0, "note")).toDF("id", "k", "v", "extra"),
      tsMillis = 9000L, evolve = true)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 10000L) == 2L)
    val v2 = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    // fresh id, BOTH schemas retained, appended column exported optional
    assert(v2.contains("\"current-schema-id\" : 1"), v2)
    assert(""""schema-id" : 0""".r.findAllIn(v2).nonEmpty)
    assert("""1,\s*"name" : "extra",\s*"required" : false""".r
      .findAllIn(v2.replaceAll("\"id\" : ", "")).nonEmpty ||
      v2.contains("\"name\" : \"extra\""))
    // current read sees the evolved schema; time travel to the OLD snapshot
    // reads the OLD schema (no phantom null 'extra' column)
    assert(IcebergInterop.readIceberg(spark, out).columns.contains("extra"))
    val old = IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(firstSnap))
    assert(!old.columns.contains("extra"),
      s"old snapshot must read with its own schema, got ${old.columns.mkString(",")}")
    assert(old.count() == 4L)
  }

  test("readIcebergChanges: watermark consumption, head emptiness, rewrite refusal, bad watermark") {
    import spark.implicits._
    val t = sampleTable()
    val out = tmp("ice_changes")
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 5000L) == 1L)
    def curSnap(): Long = {
      val hint = Files.readAllLines(Paths.get(out, "metadata", "version-hint.text"))
        .asScala.head.trim
      val txt = new String(Files.readAllBytes(
        Paths.get(out, "metadata", s"v$hint.metadata.json")))
      """"current-snapshot-id" : (\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    }
    val snap0 = curSnap()
    t.append(Seq((9L, "z", 90.0), (10L, "z", 91.0)).toDF("id", "k", "v"), tsMillis = 3000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 6000L) == 2L)

    val (head, delta) = IcebergInterop.readIcebergChanges(spark, out, snap0)
    assert(head == curSnap() && head != snap0)
    assert(delta.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(9L, 10L))
    // at the head: empty, watermark unchanged
    val (h2, none) = IcebergInterop.readIcebergChanges(spark, out, head)
    assert(h2 == head && none.isEmpty)
    // a watermark that is not on the lineage fails loudly
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChanges(spark, out, 424242L))
      .getMessage.contains("not an ancestor"))

    // compaction rewrites the live set: consumption across it must refuse
    t.compact(target = 1, tsMillis = 7000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 8000L) == 3L)
    val e = intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChanges(spark, out, snap0))
    assert(e.getMessage.contains("removes"), e.getMessage)
    // a consumer whose watermark is PAST the compaction reads cleanly
    val snapAfterCompact = curSnap()
    t.append(Seq((11L, "w", 95.0)).toDF("id", "k", "v"), tsMillis = 9000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, tsMillis = 10000L) == 4L)
    val (h3, d3) = IcebergInterop.readIcebergChanges(spark, out, snapAfterCompact)
    assert(h3 == curSnap() && d3.collect().map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("adversarial reads: truncated metadata, corrupt manifests, dangling references all fail loudly") {
    // the Delta reader got this battery in round 7 (DeltaInteropSpec);
    // same stance here: a damaged table must ERROR, never silently
    // misread (round-7 verdict #5)
    def freshExport(): java.nio.file.Path = {
      val out = tmp("ice_adv")
      IcebergInterop.exportIceberg(sampleTable(), out, tsMillis = 5000L)
      Paths.get(out)
    }

    // (a) truncated metadata.json — cut mid-object
    locally {
      val root = freshExport()
      val metaPath = root.resolve("metadata").resolve("v1.metadata.json")
      val bytes = Files.readAllBytes(metaPath)
      Files.write(metaPath, java.util.Arrays.copyOf(bytes, bytes.length / 2))
      intercept[Exception](IcebergInterop.readIceberg(spark, root.toString))
    }

    // (b) metadata.json that is not JSON at all
    locally {
      val root = freshExport()
      Files.write(root.resolve("metadata").resolve("v1.metadata.json"),
        "not json {{{".getBytes("UTF-8"))
      intercept[Exception](IcebergInterop.readIceberg(spark, root.toString))
    }

    // (c) manifest list pointing at a manifest file that does not exist
    locally {
      val root = freshExport()
      val metaDir = root.resolve("metadata")
      val manifest = Files.list(metaDir).iterator().asScala
        .find(_.getFileName.toString.startsWith("graft-m0-")).get
      Files.delete(manifest)
      val e = intercept[IllegalArgumentException](
        IcebergInterop.readIceberg(spark, root.toString))
      assert(e.getMessage.contains("missing"), e.getMessage)
    }

    // (d) manifest that is not an Avro container file
    locally {
      val root = freshExport()
      val metaDir = root.resolve("metadata")
      val manifest = Files.list(metaDir).iterator().asScala
        .find(_.getFileName.toString.startsWith("graft-m0-")).get
      Files.write(manifest, "garbage".getBytes("UTF-8"))
      intercept[Exception](IcebergInterop.readIceberg(spark, root.toString))
    }

    // (e0) partition-specs and the legacy partition-spec field CONTRADICT
    // each other — refused outright rather than trusting either side
    locally {
      val root = freshExport()
      val metaPath = root.resolve("metadata").resolve("v1.metadata.json")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.readTree(Files.readAllBytes(metaPath))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val f = m.createObjectNode()
      f.put("name", "k"); f.put("transform", "identity")
      f.put("source-id", 2); f.put("field-id", 1000)
      node.withArray("partition-spec").add(f) // legacy says partitioned; modern says flat
      Files.write(metaPath, Seq(m.writeValueAsString(node)).asJava)
      val e = intercept[IllegalArgumentException](
        IcebergInterop.exportIcebergIncremental(sampleTable(), root.toString,
          tsMillis = 6000L))
      assert(e.getMessage.contains("CONTRADICTORY"), e.getMessage)
    }

    // (e) partition spec referencing a schema field-id that does not exist
    locally {
      val root = freshExport()
      val metaPath = root.resolve("metadata").resolve("v1.metadata.json")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.readTree(Files.readAllBytes(metaPath))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val spec = node.withArray("partition-specs").get(0)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      def ghost() = {
        val f = m.createObjectNode()
        f.put("name", "ghost"); f.put("transform", "identity")
        f.put("source-id", 999); f.put("field-id", 1000)
        f
      }
      // corrupt BOTH spec fields consistently, or the cross-field
      // consistency guard fires before the field-id resolution under test
      spec.withArray("fields").add(ghost())
      node.withArray("partition-spec").add(ghost())
      Files.write(metaPath, Seq(m.writeValueAsString(node)).asJava)
      // spec resolution (the incremental guard path) must fail loudly on
      // the unknown field-id — not invent a column
      val e = intercept[IllegalArgumentException](
        IcebergInterop.exportIcebergIncremental(sampleTable(), root.toString,
          tsMillis = 6000L))
      assert(e.getMessage.contains("unknown field-id"), e.getMessage)
    }

    // (f) current-snapshot-id pointing at a snapshot that is not in the list
    locally {
      val root = freshExport()
      val metaPath = root.resolve("metadata").resolve("v1.metadata.json")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.readTree(Files.readAllBytes(metaPath))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.put("current-snapshot-id", 424242L)
      Files.write(metaPath, Seq(m.writeValueAsString(node)).asJava)
      // a dangling current pointer reads as EMPTY (the no-snapshot shape),
      // never as a partial table
      assert(IcebergInterop.readIceberg(spark, root.toString).count() == 0L)
    }

    // (g) metadata dir present but empty — no versions at all
    locally {
      val root = Paths.get(tmp("ice_adv_empty"))
      Files.createDirectories(root.resolve("metadata"))
      val e = intercept[IllegalArgumentException](
        IcebergInterop.readIceberg(spark, root.toString))
      assert(e.getMessage.contains("no vN.metadata.json"), e.getMessage)
    }

    // (h) a data file named by the manifest deleted from disk — the scan
    // must error, not silently return the surviving subset
    locally {
      val root = freshExport()
      val dataFile = Files.walk(root.resolve("data")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.delete(dataFile)
      intercept[Exception](
        IcebergInterop.readIceberg(spark, root.toString).count())
    }
  }

  test("manifest scale probe: 100k-entry Avro manifest writes and replays in metadata time") {
    // the Iceberg twin of the Delta 100k-action checkpoint probe: manifests
    // are driver-side metadata, so a production-file-count manifest must
    // stay seconds — this pins the O(live files) class before a real
    // deployment discovers otherwise
    val metaDir = Paths.get(tmp("ice_100k")).resolve("metadata")
    Files.createDirectories(metaDir)
    // reach the private writer through a real export's manifest shape:
    // hand-write with the same Avro schema the exporter uses
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"block_size_in_bytes","type":"long"}]}}]}""".stripMargin)
    val p = metaDir.resolve("m-100k.avro")
    val t0 = System.nanoTime()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, p.toFile)
    val dfSchema = schema.getField("data_file").schema()
    (0 until 100000).foreach { i =>
      val e = new org.apache.avro.generic.GenericData.Record(schema)
      e.put("status", 1); e.put("snapshot_id", 7L)
      val df = new org.apache.avro.generic.GenericData.Record(dfSchema)
      df.put("file_path", s"file:///t/data/part-$i.parquet")
      df.put("file_format", "PARQUET")
      df.put("partition", new org.apache.avro.generic.GenericData.Record(
        dfSchema.getField("partition").schema()))
      df.put("record_count", 1000L)
      df.put("file_size_in_bytes", 134217728L)
      df.put("block_size_in_bytes", 134217728L)
      e.put("data_file", df)
      w.append(e)
    }
    w.close()
    val writeSecs = (System.nanoTime() - t0) / 1e9
    // replay: full read-back of every entry, the incremental export's shape
    val t1 = System.nanoTime()
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      p.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    var n = 0
    try { while (r.hasNext) { r.next(); n += 1 } } finally r.close()
    val readSecs = (System.nanoTime() - t1) / 1e9
    assert(n == 100000)
    assert(writeSecs < 30.0 && readSecs < 30.0,
      f"100k-entry manifest must be metadata-scale (write $writeSecs%.1f s, read $readSecs%.1f s)")
  }

  test("export hard-links data files (zero data bytes moved on one filesystem)") {
    val t = sampleTable()
    val out = tmp("ice_link")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val dataFiles = Files.list(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.nonEmpty)
    val linkCount = Files.getAttribute(dataFiles.head, "unix:nlink").asInstanceOf[Int]
    assert(linkCount >= 2, s"expected a hard link, got nlink=$linkCount")
  }

  test("icebergSnapshotAt: snapshot-log timestamp travel; expiry trims the log") {
    val t = sampleTable()
    val out = tmp("ice_ts")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)                            // snap1
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 1L, 6000L) == 1L) // snap2
    val snap1 = IcebergInterop.icebergSnapshotAt(out, 5000L)
    assert(IcebergInterop.icebergSnapshotAt(out, 5999L) == snap1)
    val snap2 = IcebergInterop.icebergSnapshotAt(out, 6000L)
    assert(snap1 != snap2 &&
      IcebergInterop.icebergSnapshotAt(out, Long.MaxValue) == snap2)
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap1)).count() == 4L)
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap2)).count() == 3L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.icebergSnapshotAt(out, 4999L)).getMessage.contains("at or before"))
    // equal timestamps resolve to the LATEST log entry, never a
    // superseded view (the log is append-ordered)
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 2L, 6000L) == 1L)
    val snap3 = IcebergInterop.icebergSnapshotAt(out, 6000L)
    assert(snap3 != snap2 &&
      IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap3)).count() == 2L)
    // the metadata carries a spec-shaped snapshot-log for foreign engines
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    assert(metaTxt.contains("snapshot-log"))
    // expiry prunes the log WITH the snapshots: an expired instant must
    // refuse, never silently resolve to a different snapshot's view
    assert(IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 7000L)._1 == 2)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.icebergSnapshotAt(out, 5500L)).getMessage.contains("expired"))
    assert(IcebergInterop.icebergSnapshotAt(out, 6000L) == snap3)
  }

  test("renameIcebergColumn: metadata-only rename with field-id read resolution") {
    val t = TxTable(spark, tmp("ice_ren_src"))
    t.append((0L until 10L).map(i => (i, s"k$i", i * 2.0)).toDF("id", "k", "v"),
      tsMillis = 1000L)
    val out = tmp("ice_ren_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L) // snap1, schema 0
    val before = IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq
    def dataSet = Files.list(Paths.get(out, "data")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val filesBefore = dataSet

    IcebergInterop.renameIcebergColumn(spark, out, "v", "score", 6000L)
    assert(dataSet == filesBefore, "a rename must move zero data bytes")
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.columns.toSeq == Seq("id", "k", "score"))
    assert(live.orderBy("id").collect().toSeq == before,
      "values must be untouched (Row equality is positional)")
    // a filter on the NEW name resolves the OLD physical bytes
    assert(live.where(col("score") > 15.0).count() == 2L) // ids 8, 9
    // snapshots are schema-pinned: snap1 still reads the OLD name
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    val travel = IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap1))
    assert(travel.columns.toSeq == Seq("id", "k", "v") && travel.count() == 10L)
    // the name mapping rides the metadata for foreign engines over the
    // id-less hard-linked files
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    assert(metaTxt.contains("schema.name-mapping.default"))

    // a DELETE over the renamed logical view resolves physical bytes
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("score") > 15.0, 7000L) == 2L)
    assert(IcebergInterop.readIceberg(spark, out).count() == 8L)
    // compaction migrates survivors to the CURRENT physical names
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 8000L)._2 == 2L)
    val post = IcebergInterop.readIceberg(spark, out)
    assert(post.columns.toSeq == Seq("id", "k", "score") && post.count() == 8L)
    assert(post.agg(sum("score")).as[Double].head() ==
      before.map(_.getDouble(2)).sum - (16.0 + 18.0))

    // a second rename rides the accumulated history; rename-back to a
    // name the SAME id once held is legal
    IcebergInterop.renameIcebergColumn(spark, out, "score", "points", 9000L)
    assert(IcebergInterop.readIceberg(spark, out).columns.toSeq ==
      Seq("id", "k", "points"))
    IcebergInterop.renameIcebergColumn(spark, out, "points", "v", 9500L)
    assert(IcebergInterop.readIceberg(spark, out)
      .agg(sum("v")).as[Double].head() == post.agg(sum("score")).as[Double].head())

    // refusals: missing source, current-name collision, cross-id name
    // reuse, self-rename
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "nope", "x"))
      .getMessage.contains("no column"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "k", "v"))
      .getMessage.contains("already has"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "k", "score"))
      .getMessage.contains("already named field id"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "k", "k"))
      .getMessage.contains("no-op"))
  }

  test("deleteFromIcebergByKey refuses key types that diverge from the table schema") {
    val t = TxTable(spark, tmp("ice_eqtype_src"))
    t.append((0L until 4L).map(i => (i, i * 1.0)).toDF("id", "v"), tsMillis = 1000L)
    val out = tmp("ice_eqtype_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // a string key against a long column would write an equality-delete
    // parquet whose field-id resolves to the wrong physical type for
    // spec-conforming foreign readers — refuse, never cast silently
    assert(intercept[IllegalArgumentException](
      IcebergInterop.deleteFromIcebergByKey(spark, out, Seq("1").toDF("id"), 6000L))
      .getMessage.contains("cast the keys"))
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out, Seq(1L).toDF("id"), 6000L) == 1L)
    assert(IcebergInterop.readIceberg(spark, out).count() == 3L)
  }

  test("readIcebergChangelog: inserts AND deletes; replace snapshots are silent") {
    val t = TxTable(spark, tmp("ice_clog_src"))
    t.append((0L until 10L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 1000L)
    val out = tmp("ice_clog_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, 5000L) == 1L)   // snap1
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    t.append((10L until 14L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, 6000L) == 2L)   // snap2: insert
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("id") % 5 === 0, 7000L) == 3L)                                   // snap3: delete
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 8000L)._2 == 3L) // snap4: replace
    val (head, log) = IcebergInterop.readIcebergChangelog(spark, out, snap1)
    val rows = log.select("id", "_change_type", "_change_ordinal")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == ((10L until 14L).map(i => (i, "insert", 1L)).toSet ++
      Set((0L, "delete", 2L), (5L, "delete", 2L), (10L, "delete", 2L))),
      s"got $rows")
    // the replace edge (ordinal 3) contributed NOTHING; head watermark works
    assert(log.where(col("_change_ordinal") === 3L).isEmpty)
    assert(IcebergInterop.readIcebergChangelog(spark, out, head)._2.isEmpty)
    // an equality delete landing in the range REPLAYS as a delete edge:
    // the parent-live rows whose key matches (id 3 — ids 0/5/10 are
    // already dead and must NOT re-emit)
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(3L, 5L).toDF("id"), 9000L) == 2L)                                // snap5
    val (_, log2) = IcebergInterop.readIcebergChangelog(spark, out, snap1)
    assert(log2.select("id", "_change_type", "_change_ordinal")
        .as[(Long, String, Long)].collect().toSet ==
      rows + ((3L, "delete", 4L)),
      s"got ${log2.select("id", "_change_type", "_change_ordinal").collect().toSeq}")
    // a consumer already past the eq-delete edge reads an empty feed
    val snap5 = IcebergInterop.icebergSnapshotAt(out, Long.MaxValue)
    assert(IcebergInterop.readIcebergChangelog(spark, out, snap5)._2.isEmpty)
    // unknown watermark refuses like the append-only reader
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChangelog(spark, out, 424242L))
      .getMessage.contains("not an ancestor"))
    // a watermark surviving only as the kept head's parent POINTER after
    // an expire refuses loudly, not with a bare lookup error
    assert(IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 10000L)._1 == 4)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChangelog(spark, out, head))
      .getMessage.contains("EXPIRED"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIcebergChanges(spark, out, head))
      .getMessage.contains("EXPIRED"))
  }

  test("dropIcebergColumn: metadata-only drop — schema-pinned travel, id never reused") {
    val t = TxTable(spark, tmp("ice_drop_src"))
    t.append((0L until 6L).map(i => (i, s"k$i", i * 2.0)).toDF("id", "k", "v"),
      tsMillis = 1000L)
    val out = tmp("ice_drop_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    def dataSet = Files.list(Paths.get(out, "data")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val filesBefore = dataSet
    IcebergInterop.dropIcebergColumn(spark, out, "k", 6000L)
    assert(dataSet == filesBefore, "a drop must move zero data bytes")
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.columns.toSeq == Seq("id", "v") && live.count() == 6L)
    // time travel below the drop still reads the column (schema-pinned)
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap1))
      .columns.contains("k"))
    // rename after drop works over the shared schema history
    IcebergInterop.renameIcebergColumn(spark, out, "v", "score", 7000L)
    val renamed = IcebergInterop.readIceberg(spark, out)
    assert(renamed.columns.toSeq == Seq("id", "score"))
    assert(renamed.agg(sum("score")).as[Double].head() == 30.0)
    // the dropped field's NAME is never reusable for a different id —
    // old files still physically carry its bytes (the leak refusal)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "score", "k"))
      .getMessage.contains("already named field id"))
    // refusals: missing column, last column, partition source
    assert(intercept[IllegalArgumentException](
      IcebergInterop.dropIcebergColumn(spark, out, "nope"))
      .getMessage.contains("no column"))
    IcebergInterop.dropIcebergColumn(spark, out, "id", 8000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.dropIcebergColumn(spark, out, "score"))
      .getMessage.contains("last column"))
    val tp = TxTable(spark, tmp("ice_drop_p_src"))
    tp.append(Seq((1L, "2024-01-01", 1.0)).toDF("id", "day", "v"),
      tsMillis = 1000L, partitionBy = Seq("day"))
    val outp = tmp("ice_drop_p_exp")
    IcebergInterop.exportIceberg(tp, outp, tsMillis = 5000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.dropIcebergColumn(spark, outp, "day"))
      .getMessage.contains("partition source"))
  }

  test("renameIcebergColumn refuses partition sources; eq-deletes refuse renamed keys") {
    // partition-source rename refusal
    val t = TxTable(spark, tmp("ice_ren_part_src"))
    t.append(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
      .toDF("id", "day", "v"), tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("ice_ren_part_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.renameIcebergColumn(spark, out, "day", "dt"))
      .getMessage.contains("partition source"))

    // equality deletes refuse renamed key columns (write side)
    val t2 = TxTable(spark, tmp("ice_ren_eq_src"))
    t2.append((0L until 6L).map(i => (i, s"e$i", i * 1.0)).toDF("id", "ekey", "v"),
      tsMillis = 1000L)
    val out2 = tmp("ice_ren_eq_exp")
    IcebergInterop.exportIceberg(t2, out2, tsMillis = 5000L)
    IcebergInterop.renameIcebergColumn(spark, out2, "ekey", "entity", 6000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.deleteFromIcebergByKey(spark, out2,
        Seq("e1").toDF("entity"), 7000L))
      .getMessage.contains("renamed"))
    // position deletes still work on the renamed table
    assert(IcebergInterop.deleteFromIceberg(spark, out2,
      col("entity") === "e1", 7000L) == 1L)
    assert(IcebergInterop.readIceberg(spark, out2).count() == 5L)
    // the refusal's own remedy must WORK: a full rewrite migrates every
    // file to the current physical names, and the same equality delete
    // is accepted afterwards (the refusal is per-file-precise, not
    // permanent schema history)
    val (nf, dead) = IcebergInterop.rewriteIcebergData(spark, out2, 8000L)
    assert(nf >= 1 && dead == 1L, s"($nf, $dead)")
    assert(IcebergInterop.readIceberg(spark, out2).count() == 5L)
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out2,
      Seq("e2").toDF("entity"), 9000L) == 1L)
    assert(IcebergInterop.readIceberg(spark, out2).count() == 4L)
  }

  test("expireIcebergSnapshots: shared-manifest safety, physical reclaim, loud expired reads") {
    val t = TxTable(spark, tmp("ice_expire_src"))
    t.append((0L until 20L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 1000L)
    t.append((20L until 40L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 2000L)
    val out = tmp("ice_expire_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)                          // snap1
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") < 4, 6000L) == 4L) // snap2
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 7000L)._1 == 1)          // snap3
    def snapOf(v: Int): Long = {
      val txt = new String(Files.readAllBytes(Paths.get(out, "metadata", s"v$v.metadata.json")))
      """"current-snapshot-id" : (\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    }
    val (snap1, snap2) = (snapOf(1), snapOf(2))
    val pre = IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq
    // the export's two original files: after compaction the live view is
    // (carried original + compacted survivor) — the REPLACED original and
    // the delete parquet stay on disk only for snap1/snap2 time travel
    val originals = Files.list(Paths.get(out, "data")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet")).toSet
    assert(originals.size == 2)
    val liveFiles = IcebergInterop.readIceberg(spark, out).inputFiles.toSet
    val carried = originals.filter(p => liveFiles.exists(_.endsWith(p.getFileName.toString)))
    val replaced = originals.diff(carried)
    assert(carried.size == 1 && replaced.size == 1)

    // keepLast=2: only snap1 expires — its data manifest AND both data
    // files are SHARED with snap2 (the delete commit reuses the export's
    // manifests verbatim), so reclaim must touch only snap1's own
    // manifest list; snap2 still time-travels to the masked view
    val (e1, f1, b1) = IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 2, 8000L)
    assert(e1 == 1 && f1 == 1 && b1 > 0L,
      s"expected exactly snap1's manifest list reclaimed, got ($e1, $f1, $b1)")
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq == pre)
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap2)).count() == 36L,
      "a KEPT snapshot must still time-travel after a partial expire")
    assert(intercept[IllegalArgumentException](
      IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(snap1)))
      .getMessage.contains("does not exist"))

    // keepLast=1: snap2 expires — now the replaced original data file,
    // the delete parquet, the shared manifest, and the delete manifest
    // all become unreachable and are physically reclaimed
    val (e2, f2, _) = IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 9000L)
    assert(e2 == 1 && f2 >= 4, s"expected >=4 files reclaimed, got ($e2, $f2)")
    val post = IcebergInterop.readIceberg(spark, out)
    assert(post.orderBy("id").collect().toSeq == pre)
    // the replaced original's bytes are reclaimed; the carried one survives
    assert(!Files.exists(replaced.head),
      "the superseded data file's bytes must be reclaimed")
    assert(Files.exists(carried.head),
      "the carried data file must survive the expire")
    // idempotent; keepLast bounds checked
    assert(IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 9500L)
      == ((0, 0, 0L)))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 0))
      .getMessage.contains("keepLast"))
  }

  test("expire with a missing expired-snapshot manifest list fails before any mutation") {
    val t = sampleTable()
    val out = tmp("ice_exp_corrupt")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 1L, 6000L) == 1L)
    // corrupt: remove snap1's manifest list — its reference set is now
    // uncomputable, so reclaim must refuse rather than guess (deleting
    // blindly could orphan files the kept snapshots share)
    val v1Txt = new String(Files.readAllBytes(Paths.get(out, "metadata", "v1.metadata.json")))
    val listUri = """"manifest-list" : "([^"]+)"""".r.findFirstMatchIn(v1Txt).get.group(1)
    val listPath = Paths.get(new java.net.URI(listUri))
    val hidden = listPath.resolveSibling(listPath.getFileName.toString + ".bak")
    Files.move(listPath, hidden)
    val before = IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq
    intercept[Exception](
      IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 7000L))
    // nothing moved: the live view is intact and no new metadata version landed
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq == before)
    assert(!Files.exists(Paths.get(out, "metadata", "v3.metadata.json")),
      "a failed expire must not publish a new metadata version")
    // restored, the same expire succeeds
    Files.move(hidden, listPath)
    assert(IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 1, 8000L)._1 == 1)
  }

  test("expire metadata retention: old vN.metadata.json pruned, hint resolves") {
    val t = sampleTable()
    val out = tmp("ice_meta_ret")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)                            // v1
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 1L, 6000L) == 1L) // v2
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 7000L)._1 >= 1)            // v3
    val pre = IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq
    // default: pure snapshot expiry, every metadata version kept
    val (_, f1, _) = IcebergInterop.expireIcebergSnapshots(spark, out, keepLast = 2, 8000L)
    assert(Files.exists(Paths.get(out, "metadata", "v1.metadata.json")))
    // opt-in retention: keep only the version this expire publishes (v5)
    val (e2, f2, _) = IcebergInterop.expireIcebergSnapshots(spark, out,
      keepLast = 1, 9000L, keepMetadataVersions = 1)
    assert(e2 == 1)
    (1 to 4).foreach(v => assert(
      !Files.exists(Paths.get(out, "metadata", s"v$v.metadata.json")),
      s"v$v.metadata.json must be pruned"))
    assert(Files.exists(Paths.get(out, "metadata", "v5.metadata.json")))
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id").collect().toSeq == pre)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.expireIcebergSnapshots(spark, out, keepMetadataVersions = 0))
      .getMessage.contains("keepMetadataVersions"))
  }

  test("changelog delete edge skips positions already dead at the parent snapshot") {
    val t = TxTable(spark, tmp("ice_clog_ovl_src"))
    t.append((0L until 5L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 1000L)
    val out = tmp("ice_clog_ovl_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, 5000L) == 1L)      // snap1
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    def delFiles() = {
      val d = Paths.get(out, "data", "deletes")
      if (!Files.isDirectory(d)) Set.empty[java.nio.file.Path]
      else { val s = Files.list(d)
        try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
        finally s.close() }
    }
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 0L, 6000L) == 1L) // snap2
    val d1 = delFiles()
    assert(IcebergInterop.deleteFromIceberg(spark, out, col("id") === 1L, 7000L) == 1L) // snap3
    val d2 = (delFiles() -- d1).toSeq
    assert(d2.size == 1)
    // make snap3's delete file a FOREIGN overlap: it re-kills position 0,
    // already dead at the parent — a spec-legal shape some engines write.
    // (the data-file URI comes from d1, NOT d2: reading d2 here would pin
    // its pre-replacement size in Spark's shared file-status cache)
    val fp = spark.read.parquet(d1.head.toString)
      .select("file_path").as[String].head()
    val stage = Files.createTempDirectory("ice_ovl_stage")
    val delSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType, nullable = false,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483546L).build()),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2147483545L).build())))
    val overlap = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(fp, 0L),
        org.apache.spark.sql.Row(fp, 1L)), delSchema)
    val fidKey = "spark.sql.parquet.fieldId.write.enabled"
    spark.conf.set(fidKey, "true")
    try overlap.coalesce(1).sort("pos").write.mode("overwrite")
      .parquet(stage.toString)
    finally spark.conf.unset(fidKey)
    val part = { val s = Files.list(stage)
      try s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally s.close() }
    Files.move(part, d2.head, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the live view is unchanged — overlapping kills are idempotent there
    assert(IcebergInterop.readIceberg(spark, out)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // the feed must NOT re-emit id 0 at ordinal 2: it was already dead
    val (_, log) = IcebergInterop.readIcebergChangelog(spark, out, snap1)
    val rows = log.select("id", "_change_type", "_change_ordinal")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((0L, "delete", 1L), (1L, "delete", 2L)), s"got $rows")
  }

  test("per-file column bounds: manifests carry lower/upper bounds, range reads skip files") {
    val t = TxTable(spark, tmp("ice_bounds"))
    // three single-file appends with disjoint id ranges, stats recorded
    (0 until 3).foreach { b =>
      t.append((b * 10L until (b + 1) * 10L).map(i => (i, i * 2.0))
        .toDF("id", "v").coalesce(1),
        tsMillis = 1000L + b, statsCols = Seq("id", "v"))
    }
    val out = tmp("ice_bounds_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // the manifest physically carries the spec's bounds maps
    val manifest = { val s = Files.list(Paths.get(out, "metadata"))
      try s.iterator().asScala.find(_.getFileName.toString.startsWith("graft-m0")).get
      finally s.close() }
    val rdr = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      manifest.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val entries = try rdr.iterator().asScala.toSeq finally rdr.close()
    assert(entries.size == 3)
    val boundsSeen = entries.map { e =>
      val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val lows = df.get("lower_bounds").asInstanceOf[java.util.List[_]].asScala.map { r0 =>
        val r = r0.asInstanceOf[org.apache.avro.generic.GenericRecord]
        val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer]
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b)
        r.get("key").asInstanceOf[Int] ->
          java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      }.toMap
      lows(1).getLong // field-id 1 = 'id' (long, little-endian per spec)
    }.toSet
    assert(boundsSeen == Set(0L, 10L, 20L), s"got $boundsSeen")
    // range read scans ONE file; result post-filter is exact
    val pruned = IcebergInterop.readIcebergRange(spark, out, Seq(("id", 12.0, 17.0)))
    assert(pruned.inputFiles.length == 1, s"got ${pruned.inputFiles.length} files")
    assert(pruned.where(col("id").between(12, 17)).count() == 6L)
    // a two-dimensional range intersects both columns' bounds
    val two = IcebergInterop.readIcebergRange(spark, out,
      Seq(("id", 0.0, 29.0), ("v", 44.0, 50.0)))
    assert(two.inputFiles.length == 1)
    // a column without bounds is conservatively scanned
    assert(IcebergInterop.readIcebergRange(spark, out,
      Seq(("nope", 0.0, 1.0))).inputFiles.length == 3)
    // an empty intersection reads nothing
    assert(IcebergInterop.readIcebergRange(spark, out,
      Seq(("id", 100.0, 200.0))).count() == 0L)
    // the incremental mirror carries bounds too
    val out2 = tmp("ice_bounds_incr")
    assert(IcebergInterop.exportIcebergIncremental(t, out2, 6000L) == 1L)
    t.append((30L until 40L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1),
      tsMillis = 4000L, statsCols = Seq("id", "v"))
    assert(IcebergInterop.exportIcebergIncremental(t, out2, 7000L) == 2L)
    assert(IcebergInterop.readIcebergRange(spark, out2,
      Seq(("id", 35.0, 36.0))).inputFiles.length == 1)
  }

  test("partitioned position deletes: per-partition delete files, tuple-pruned reads, identity predicates") {
    // identity spec with Column Projection: 'day' lives only in the
    // manifest tuples — the delete's predicate must still see it
    val t = TxTable(spark, tmp("ice_pdel"))
    t.append(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
        (3L, "2024-01-01", 3.0), (4L, "2024-01-03", 4.0),
        (5L, "2024-01-02", 5.0), (6L, "2024-01-01", 6.0))
      .toDF("id", "day", "v"), tsMillis = 1000L, partitionBy = Seq("day"))
    val out = tmp("ice_pdel_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    def delFiles() = {
      val d = Paths.get(out, "data", "deletes")
      if (!Files.isDirectory(d)) Seq.empty[java.nio.file.Path]
      else { val s = Files.list(d)
        try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
        finally s.close() }
    }
    // the predicate mixes a PHYSICAL column and the PROJECTED partition
    // column; it touches days 01 (ids 1,3,6) and 02 (id 2) but not 03
    val deleted = IcebergInterop.deleteFromIceberg(spark, out,
      col("id") <= 2L || (col("day") === "2024-01-01" && col("v") > 2.5), 6000L)
    assert(deleted == 4L)
    // one spec-shaped delete file PER TOUCHED PARTITION — not one global
    assert(delFiles().size == 2, s"got ${delFiles().size} delete files")
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    assert(live.schema.fieldNames.toSeq == Seq("id", "day", "v"))
    // the pruned read composes with delete application: an untouched
    // partition reads clean, a fully-deleted one reads empty
    val p3 = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("day").contains("2024-01-03"))
    assert(p3.select("id").as[Long].collect().toSeq == Seq(4L))
    val p1 = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("day").contains("2024-01-01"))
    assert(p1.count() == 0L)
    // time travel below the delete reads everything; re-delete is a no-op
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out,
      snapshotAsOf = Some(snap0)).count() == 6L)
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("id") <= 2L || (col("day") === "2024-01-01" && col("v") > 2.5),
      7000L) == 0L)
    // a second, stacked delete on one partition: only that partition
    // gains a delete file
    val before = delFiles().size
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("day") === "2024-01-02", 8000L) == 1L)
    assert(delFiles().size == before + 1)
    assert(IcebergInterop.readIceberg(spark, out)
      .select("id").as[Long].collect().sorted.toSeq == Seq(4L))
    // compaction with FULLY-DEAD touched partitions: no survivor bytes
    // land, the delete-free snapshot still reads right, re-compaction is
    // a no-op
    val (nf, dead) = IcebergInterop.compactIcebergDeletes(spark, out, 9000L)
    assert(nf == 2 && dead == 5L, s"($nf, $dead)")
    assert(IcebergInterop.readIceberg(spark, out)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((4L, "2024-01-03", 4.0)))
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 10000L) == ((0, 0L)))
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("day").contains("2024-01-01"))
      .count() == 0L)
  }

  test("tailIcebergInto: metadata-version txn marker; a stale watermark never duplicates") {
    val t = TxTable(spark, tmp("ice_tail_src"))
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), tsMillis = 1000L)
    val out = tmp("ice_tail_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, 5000L) == 1L)   // snap1
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    val sink = TxTable(spark, tmp("ice_tail_sink"))
    t.append(Seq((3L, 3.0)).toDF("id", "v"), tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, 6000L) == 2L)   // snap2
    val w1 = IcebergInterop.tailIcebergInto(spark, out, sink, snap1, 1000L)
    assert(sink.read().select("id").as[Long].collect().toSeq == Seq(3L))
    t.append(Seq((4L, 4.0)).toDF("id", "v"), tsMillis = 3000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, 7000L) == 3L)   // snap3
    // a restarted consumer re-polls with the STALE snap1 watermark: the
    // sink's recorded metadata version clamps the range to snap2's head
    val w2 = IcebergInterop.tailIcebergInto(spark, out, sink, snap1, 2000L)
    assert(w2 != w1)
    assert(sink.read().select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L),
      "a stale watermark must not duplicate already-landed snapshots")
    // a replayed trigger at the head is a no-op
    assert(IcebergInterop.tailIcebergInto(spark, out, sink, w2, 3000L) == w2)
    assert(sink.read().count() == 2L)
    // the recorded txn version resolves to the head ACTUALLY read — the
    // invariant that makes the clamp race-free when a producer commit
    // lands mid-poll
    val ver = sink.txnVersion(s"graft-iceberg-tail|$out").get
    val vTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", s"v$ver.metadata.json")))
    assert(s""""current-snapshot-id" : $w2""".r.findFirstIn(vTxt).nonEmpty,
      s"txn version $ver must be the metadata version whose head is $w2")
  }

  test("position deletes on day-transform and composite specs: per-tuple delete files, pruned reads") {
    import java.sql.Timestamp
    // day(ts) spec: ts stays physical, tuples are day ordinals
    val t = TxTable(spark, tmp("ice_daydel"))
    t.append(Seq((1L, Timestamp.valueOf("2024-03-01 08:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-03-01 17:00:00"), 2.0))
      .toDF("id", "ts", "v"), tsMillis = 1000L)
    t.append(Seq((3L, Timestamp.valueOf("2024-03-02 09:00:00"), 3.0),
        (4L, Timestamp.valueOf("2024-03-02 10:00:00"), 4.0))
      .toDF("id", "ts", "v"), tsMillis = 2000L)
    val out = tmp("ice_daydel_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    // the delete's predicate spans one day; only that tuple's delete file lands
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("id") === 1L || col("id") === 4L, 6000L) == 2L)
    val dels = { val s = Files.list(Paths.get(out, "data", "deletes"))
      try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close() }
    assert(dels == 2, s"two touched days → two delete files, got $dels")
    assert(IcebergInterop.readIceberg(spark, out)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // day-ordinal pruned read composes with the deletes
    val d1 = java.time.LocalDate.parse("2024-03-01").toEpochDay.toInt
    val p1 = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("ts_day").exists {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt == d1
        case i: Int           => i == d1
        case _                => false
      })
    assert(p1.select("id").as[Long].collect().toSeq == Seq(2L))

    // composite [day(ts), identity(k)]: both dims in the tuple, k projected
    val t2 = TxTable(spark, tmp("ice_compdel"))
    t2.append(Seq(
        (1L, Timestamp.valueOf("2024-03-01 08:00:00"), "a", 1.0),
        (2L, Timestamp.valueOf("2024-03-01 09:00:00"), "b", 2.0),
        (3L, Timestamp.valueOf("2024-03-02 09:00:00"), "a", 3.0))
      .toDF("id", "ts", "k", "v"), tsMillis = 1000L)
    val out2 = tmp("ice_compdel_exp")
    IcebergInterop.exportIcebergDayIdentity(t2, out2, "ts", "k", tsMillis = 5000L)
    // predicate over the PROJECTED identity dimension
    assert(IcebergInterop.deleteFromIceberg(spark, out2,
      col("k") === "a" && col("v") < 2.0, 6000L) == 1L)
    assert(IcebergInterop.readIceberg(spark, out2)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(IcebergInterop.readIcebergPruned(spark, out2,
        keep = pv => pv.get("k").contains("a"))
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("compaction on an identity-partitioned table rewrites survivors per partition") {
    val t = TxTable(spark, tmp("ice_pcompact"))
    t.append(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
        (4L, "b", 4.0), (5L, "c", 5.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_pcompact_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("id") % 2 === 1, 6000L) == 3L)
    val (nf, dead) = IcebergInterop.compactIcebergDeletes(spark, out, 7000L)
    assert(nf == 3 && dead == 3L, s"($nf, $dead)")
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "a", 2.0), (4L, "b", 4.0)))
    // the survivors keep the Column-Projected Hive layout, per partition
    val comp = Files.walk(Paths.get(out, "data", "compacted")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(comp.nonEmpty && comp.forall(_.toString.contains("k=")))
    // tuple-pruned reads over the compacted layout
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("k").contains("b"))
      .select("id").as[Long].collect().toSeq == Seq(4L))
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("k").contains("c")).count() == 0L)
    // time travel below the compaction still reads the masked view
    val hint = Files.readAllLines(Paths.get(out, "metadata", "version-hint.text"))
      .get(0).trim.toInt
    val metaTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", s"v${hint - 1}.metadata.json")))
    val preSnap = """"current-snapshot-id" : (\d+)""".r
      .findFirstMatchIn(metaTxt).get.group(1).toLong
    assert(IcebergInterop.readIceberg(spark, out, snapshotAsOf = Some(preSnap))
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("compaction folds a day-spec MERGE chain back to a delete-free snapshot") {
    // the engine's flagship production shape (b5_iceberg_upsert_days):
    // day(ts) spec maintained by upsertIceberg MERGEs — before round 13
    // its eq-delete files accumulated unboundedly (compaction refused
    // both the transform spec and the eq deletes)
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val t = TxTable(spark, tmp("ice_daycompact"))
    t.append(Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 11:00:00"), 2.0),
        (3L, ts("2024-01-02 10:00:00"), 3.0))
      .toDF("id", "ts", "v").coalesce(1), tsMillis = 1000L)
    t.clusterBy(org.apache.spark.sql.functions.to_date(col("ts")), tsMillis = 2000L)
    val out = tmp("ice_daycompact_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    // two MERGE commits: replace id 2 (lands on a NEW day), insert id 4
    assert(IcebergInterop.upsertIceberg(spark, out,
      Seq((2L, ts("2024-01-03 09:00:00"), 20.0)).toDF("id", "ts", "v"),
      Seq("id"), 6000L) == ((1L, 1L)))
    assert(IcebergInterop.upsertIceberg(spark, out,
      Seq((4L, ts("2024-01-02 12:00:00"), 4.0)).toDF("id", "ts", "v"),
      Seq("id"), 7000L) == ((1L, 1L)))
    val expected = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-03 09:00:00"), 20.0), (3L, ts("2024-01-02 10:00:00"), 3.0),
      (4L, ts("2024-01-02 12:00:00"), 4.0))
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq == expected)
    val (nf, dead) = IcebergInterop.compactIcebergDeletes(spark, out, 8000L)
    // the two eq-deletes touch every file committed strictly before them
    assert(nf >= 1 && dead == 1L, s"($nf, $dead)")
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq == expected)
    // survivors restaged under derived ts_day dirs, ts still physical
    val comp = Files.walk(Paths.get(out, "data", "compacted")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(comp.nonEmpty && comp.forall(_.toString.contains("ts_day=")))
    assert(comp.forall(p =>
      spark.read.parquet(p.toString).columns.toSeq == Seq("id", "ts", "v")),
      "the day helper column must leave the bytes; ts stays physical")
    // day pruning over the compacted tuples is exact
    val pruned = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("ts_day").contains(java.sql.Date.valueOf("2024-01-02")))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // delete-free now: a second compaction is a no-op, and a LATER merge
    // starts the cycle again
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 9000L) == ((0, 0L)))
    assert(IcebergInterop.upsertIceberg(spark, out,
      Seq((1L, ts("2024-01-04 00:00:00"), 10.0)).toDF("id", "ts", "v"),
      Seq("id"), 10000L) == ((1L, 1L)))
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 11000L)._2 == 1L)
    assert(IcebergInterop.readIceberg(spark, out).count() == 4L)
  }

  test("compaction folds a partition-scoped equality delete only inside its partition") {
    val t = TxTable(spark, tmp("ice_scompact"))
    t.append(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_scompact_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // id dies in k=a ONLY (the scoped shape); k=b keeps its id-1... none,
    // but id 2 exists only in a — scope the delete to k=a
    assert(IcebergInterop.deleteFromIcebergByKeyScoped(spark, out,
      Seq(2L).toDF("id"), Map("k" -> "a"), 6000L) == 1L)
    val (nf, dead) = IcebergInterop.compactIcebergDeletes(spark, out, 7000L)
    assert(dead == 1L, s"($nf, $dead)")
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (3L, "b", 3.0), (4L, "b", 4.0)))
    // ONLY the scoped partition's files were rewritten: k=b carried
    val comp = Files.walk(Paths.get(out, "data", "compacted")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(comp.nonEmpty && comp.forall(_.toString.contains("k=a")),
      s"k=b must carry by reference, got ${comp.mkString(",")}")
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 8000L) == ((0, 0L)))
  }

  test("compaction and full rewrite restage bucket/truncate tuples under the spec transforms") {
    // bucket[4] table takes an eq delete, compacts, stays bucket-pure
    val t = TxTable(spark, tmp("ice_bcompact"))
    t.append((0L until 12L).map(i => (i, i * 1.0)).toDF("id", "v"),
      tsMillis = 1000L)
    val out = tmp("ice_bcompact_exp")
    IcebergInterop.exportIcebergBucketed(t, out, "id", 4, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(3L, 7L).toDF("id"), 6000L) == 2L)
    val (nf, dead) = IcebergInterop.compactIcebergDeletes(spark, out, 7000L)
    assert(nf >= 1 && dead == 2L, s"($nf, $dead)")
    assert(IcebergInterop.readIceberg(spark, out).select("id").as[Long]
      .collect().sorted.toSeq == (0L until 12L).filterNot(Set(3L, 7L)))
    // every compacted file is bucket-pure under the SPEC's murmur3
    val comp = Files.walk(Paths.get(out, "data", "compacted")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(comp.nonEmpty && comp.forall(_.toString.contains("id_bucket=")))
    comp.foreach { p =>
      val b = """id_bucket=(\d+)""".r.findFirstMatchIn(p.toString).get.group(1).toInt
      val ids = spark.read.parquet(p.toString).select("id").as[Long].collect()
      assert(ids.forall(id =>
        graft.functions.IcebergTransforms.bucketOfLong(4, id) == b),
        s"file $p is not bucket-pure")
    }
    // bucket pruning over the compacted tuples still works
    val b0 = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("id_bucket").contains(
        graft.functions.IcebergTransforms.bucketOfLong(4, 8L)))
    assert(b0.select("id").as[Long].collect().contains(8L))

    // truncate[2] string table: full rewrite folds a position delete and
    // keeps prefix tuples
    val t2 = TxTable(spark, tmp("ice_tcompact"))
    t2.append(Seq((1L, "alpha", 1.0), (2L, "beta", 2.0), (3L, "alto", 3.0))
      .toDF("id", "k", "v"), tsMillis = 1000L)
    val out2 = tmp("ice_tcompact_exp")
    IcebergInterop.exportIcebergTruncated(t2, out2, "k", 2, tsMillis = 5000L)
    assert(IcebergInterop.deleteFromIceberg(spark, out2, col("id") === 1L, 6000L) == 1L)
    val (nf2, dead2) = IcebergInterop.rewriteIcebergData(spark, out2, 7000L)
    assert(nf2 >= 1 && dead2 == 1L, s"($nf2, $dead2)")
    assert(IcebergInterop.readIcebergPruned(spark, out2,
        keep = pv => pv.get("k_trunc").contains("al"))
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("partitioned delete with a partition pruner scans and deletes only kept partitions") {
    val t = TxTable(spark, tmp("ice_pdel_keep"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 1.0), (3L, "a", 1.0), (4L, "c", 1.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_pdel_keep_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // predicate matches EVERY row; keep restricts the candidate files to
    // partition k=a — the DELETE WHERE k='a' AND v=1.0 composition
    val deleted = IcebergInterop.deleteFromIceberg(spark, out,
      col("v") === 1.0, 6000L, keep = Some(pv => pv.get("k").contains("a")))
    assert(deleted == 2L)
    assert(IcebergInterop.readIceberg(spark, out)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("partitioned equality delete: global unpartitioned-spec delete file, physical-key guard") {
    val t = TxTable(spark, tmp("ice_peq"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_peq_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // an identity-projected partition source cannot key an equality
    // delete (the reader anchors the anti-join at the scan): loud refusal
    assert(intercept[IllegalArgumentException](
      IcebergInterop.deleteFromIcebergByKey(spark, out, Seq("a").toDF("k"), 6000L))
      .getMessage.contains("not physically"))
    // a physical key deletes across partitions via ONE global delete file
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(1L, 3L).toDF("id"), 6000L) == 2L)
    assert(IcebergInterop.readIceberg(spark, out)
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // the commit minted an UNPARTITIONED spec for the global delete while
    // the default spec stays the partitioned one
    val metaTxt = new String(Files.readAllBytes(Paths.get(out, "metadata",
      s"v${Files.readAllLines(Paths.get(out, "metadata", "version-hint.text"))
        .get(0).trim}.metadata.json")))
    assert(metaTxt.contains("\"spec-id\" : 1"), metaTxt)
    assert("\"default-spec-id\" : 0".r.findAllIn(metaTxt).size == 1, metaTxt)
    // pruned reads still apply the GLOBAL delete inside any partition
    val pa = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("k").contains("a"))
    assert(pa.count() == 0L)
  }

  test("upsertIceberg: one commit pairs a global equality delete with the appended rows") {
    val t = sampleTable()
    val out = tmp("ice_upsert")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    // id 2 updates, id 9 inserts — ONE commit
    val up = Seq((2L, "x", 200.0), (9L, "y", 900.0)).toDF("id", "k", "v")
    val (nk, na) = IcebergInterop.upsertIceberg(spark, out, up, Seq("id"), 6000L)
    assert((nk, na) == ((2L, 2L)))
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (2L, "x", 200.0), (3L, "a", 30.0),
        (4L, "c", 40.0), (9L, "y", 900.0)))
    // the upserted rows SURVIVE their own commit's delete (same sequence)
    // but a SECOND upsert replaces them (strictly newer sequence)
    val (nk2, na2) = IcebergInterop.upsertIceberg(spark, out,
      Seq((9L, "z", 901.0)).toDF("id", "k", "v"), Seq("id"), 7000L)
    assert((nk2, na2) == ((1L, 1L)))
    assert(IcebergInterop.readIceberg(spark, out)
      .where(col("id") === 9L).as[(Long, String, Double)].head() == ((9L, "z", 901.0)))
    // pre-upsert time travel intact; schema/type refusals loud
    assert(IcebergInterop.readIceberg(spark, out,
      snapshotAsOf = Some(snap0)).count() == 4L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.upsertIceberg(spark, out,
        Seq(("2", "x", 1.0)).toDF("id", "k", "v"), Seq("id"), 8000L))
      .getMessage.contains("cast"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.upsertIceberg(spark, out,
        Seq((1L, "x")).toDF("id", "k"), Seq("id"), 8000L))
      .getMessage.contains("exact"))
    // the changelog replays the upserts as the protocol's delete+insert
    // pairs: ordinal 1 kills the OLD id-2 row and inserts both incoming
    // rows; ordinal 2 kills the id-9 row ordinal 1 inserted and re-inserts
    val (_, clog) = IcebergInterop.readIcebergChangelog(spark, out, snap0)
    val edges = clog.select("id", "k", "v", "_change_type", "_change_ordinal")
      .as[(Long, String, Double, String, Long)].collect().toSet
    assert(edges == Set(
      (2L, "b", 20.0, "delete", 1L),
      (2L, "x", 200.0, "insert", 1L), (9L, "y", 900.0, "insert", 1L),
      (9L, "y", 900.0, "delete", 2L), (9L, "z", 901.0, "insert", 2L)),
      s"got $edges")
  }

  test("upsertIceberg: duplicate keys refuse; an aborted staging leaves no bytes in the table") {
    val t = sampleTable()
    val out = tmp("ice_upsert_guard")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    def tableFiles(): Set[String] = {
      val w = Files.walk(Paths.get(out))
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.toString).toSet
      finally w.close()
    }
    val before = tableFiles()
    // the standard MERGE precondition (the mergeDelta guard): duplicate
    // incoming keys would both survive the same-sequence delete
    assert(intercept[IllegalArgumentException](
      IcebergInterop.upsertIceberg(spark, out,
        Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "k", "v"),
        Seq("id"), 6000L)).getMessage.contains("duplicate"))
    // an empty incoming frame aborts AFTER the eq-delete half staged;
    // both halves stage in temp directories and move in only right
    // before the commit metadata, so the table directory is untouched
    assert(intercept[IllegalArgumentException](
      IcebergInterop.upsertIceberg(spark, out,
        Seq.empty[(Long, String, Double)].toDF("id", "k", "v"),
        Seq("id"), 6000L)).getMessage.contains("no rows"))
    assert(tableFiles() == before,
      "a refused upsert must leave no bytes inside the table directory")
    assert(IcebergInterop.readIceberg(spark, out).count() == 4L)
  }

  test("upsertIceberg on an identity-partitioned table keeps the uniform projected layout") {
    val t = TxTable(spark, tmp("ice_upsert_part"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_upsert_part_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)
    // update id2 into partition c (a NEW partition), insert id7 into a
    val up = Seq((2L, "c", 20.0), (7L, "a", 7.0)).toDF("id", "k", "v")
    val (nk, na) = IcebergInterop.upsertIceberg(spark, out, up, Seq("id"), 6000L)
    assert((nk, na) == ((2L, 2L)))
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "c", 20.0), (3L, "a", 3.0), (7L, "a", 7.0)))
    // the new files keep the Column-Projected layout: no staged file
    // physically carries 'k', and tuple-pruned reads see the new rows
    val dataFiles = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("deletes")).toSeq
    assert(dataFiles.forall(_.toString.contains("k=")))
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("k").contains("c"))
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("k").contains("a"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 7L))
    // keying on the identity-projected column refuses (reader anchors
    // equality deletes at the scan)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.upsertIceberg(spark, out,
        Seq((8L, "a", 8.0)).toDF("id", "k", "v"), Seq("k"), 7000L))
      .getMessage.contains("not physically"))
  }

  test("upsertIceberg onto a day(ts) spec: derived day tuples, pruning, physical ts") {
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val t = TxTable(spark, tmp("ice_upsert_days"))
    // per-day appends — the single-day-file layout the day export requires
    t.append(Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 11:00:00"), 2.0)).toDF("id", "ts", "v").coalesce(1),
      tsMillis = 1000L)
    t.append(Seq((3L, ts("2024-01-02 10:00:00"), 3.0)).toDF("id", "ts", "v")
      .coalesce(1), tsMillis = 1001L)
    val out = tmp("ice_upsert_days_exp")
    IcebergInterop.exportIcebergDays(t, out, "ts", tsMillis = 5000L)
    // id 2 UPDATES and moves to a brand-new day; id 9 INSERTS — one commit
    val up = Seq((2L, ts("2024-01-03 09:00:00"), 20.0),
      (9L, ts("2024-01-02 12:00:00"), 90.0)).toDF("id", "ts", "v")
    val (nk, na) = IcebergInterop.upsertIceberg(spark, out, up, Seq("id"), 6000L)
    assert((nk, na) == ((2L, 2L)))
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq ==
      Seq((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-03 09:00:00"), 20.0),
        (3L, ts("2024-01-02 10:00:00"), 3.0), (9L, ts("2024-01-02 12:00:00"), 90.0)))
    // the day tuples rode the manifest: tuple-pruned reads see the new
    // rows in their derived days, with the eq-delete applied inside them
    def prunedIds(day: String): Seq[Long] = IcebergInterop.readIcebergPruned(
      spark, out, keep = pv =>
        pv.get("ts_day").contains(java.sql.Date.valueOf(day)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(prunedIds("2024-01-03") == Seq(2L))
    assert(prunedIds("2024-01-02") == Seq(3L, 9L))
    assert(prunedIds("2024-01-01") == Seq(1L), "the old id-2 row must be eq-deleted")
    // the staged files keep ts PHYSICAL (a day transform is pruning
    // metadata, not Column Projection) and group under ts_day= dirs
    val upsertFiles = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("upsert-")).toSeq
    assert(upsertFiles.nonEmpty && upsertFiles.forall(_.toString.contains("ts_day=")))
    upsertFiles.foreach { p =>
      val cols = spark.read.parquet(p.toString).columns.toSet
      assert(cols == Set("id", "ts", "v"), s"$p carries $cols")
    }
    // a second upsert replaces a just-upserted key (strictly newer sequence)
    val (nk2, na2) = IcebergInterop.upsertIceberg(spark, out,
      Seq((9L, ts("2024-01-05 00:00:00"), 91.0)).toDF("id", "ts", "v"), Seq("id"), 7000L)
    assert((nk2, na2) == ((1L, 1L)))
    assert(prunedIds("2024-01-05") == Seq(9L) && prunedIds("2024-01-02") == Seq(3L))
  }

  test("partition-scoped equality delete: keys die only inside their partition") {
    val t = TxTable(spark, tmp("ice_eqscope"))
    t.append(Seq((1L, "a", 1.0), (1L, "b", 10.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "k", "v"), tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_eqscope_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L) // identity spec k
    // id 1 dies ONLY inside k=a; the same key in k=b survives
    assert(IcebergInterop.deleteFromIcebergByKeyScoped(spark, out,
      Seq(1L).toDF("id"), Map("k" -> "a"), 6000L) == 1L)
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id", "k").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "b", 10.0), (2L, "a", 2.0), (3L, "b", 3.0)),
      "the key must survive in the OTHER partition")
    // pruned reads compose with the scoped delete on both sides
    def prunedIds(k: String): Seq[Long] = IcebergInterop.readIcebergPruned(
      spark, out, keep = pv => pv.get("k").contains(k))
      .select("id").as[Long].collect().sorted.toSeq
    assert(prunedIds("a") == Seq(2L) && prunedIds("b") == Seq(1L, 3L))
    // rows appended to the partition AFTER the delete survive (the
    // strictly-older sequence rule applies inside the scope too)
    assert(IcebergInterop.appendIceberg(spark, out,
      Seq((1L, "a", 99.0)).toDF("id", "k", "v"), 7000L) == 1L)
    assert(prunedIds("a") == Seq(1L, 2L))
    // an unknown partition reaches nothing: no commit, version unchanged
    val vBefore = Files.readAllLines(
      Paths.get(out, "metadata", "version-hint.text")).get(0)
    assert(IcebergInterop.deleteFromIcebergByKeyScoped(spark, out,
      Seq(2L).toDF("id"), Map("k" -> "zzz"), 8000L) == 0L)
    assert(Files.readAllLines(
      Paths.get(out, "metadata", "version-hint.text")).get(0) == vBefore)
    // the CHANGELOG replays the scoped delete: exactly the partition's
    // matching rows emit as delete edges, the other partition's key does
    // not (consume from snap1, before the scoped delete)
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")), "UTF-8")
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    val (_, clog) = IcebergInterop.readIcebergChangelog(spark, out, snap1)
    val dels = clog.where(col("_change_type") === "delete")
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(dels == Set((1L, "a")), s"got $dels")

    // the unpartitioned table refuses (use the global delete)
    val flat = TxTable(spark, tmp("ice_eqscope_flat"))
    flat.append(Seq((1L, "a", 1.0)).toDF("id", "k", "v"), tsMillis = 1000L)
    val outFlat = tmp("ice_eqscope_flat_exp")
    IcebergInterop.exportIceberg(flat, outFlat, tsMillis = 5000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.deleteFromIcebergByKeyScoped(spark, outFlat,
        Seq(1L).toDF("id"), Map.empty, 6000L))
      .getMessage.contains("UNPARTITIONED"))
  }

  test("bucket/truncate mirrors maintain incrementally: new batches rewrite into their values") {
    val t = TxTable(spark, tmp("ice_bucket_incr"))
    t.append(Seq((1L, "aa", 1.0), (2L, "bb", 2.0), (3L, "cc", 3.0))
      .toDF("id", "k", "v"), tsMillis = 1000L)
    val out = tmp("ice_bucket_incr_exp")
    assert(IcebergInterop.exportIcebergBucketedIncremental(t, out, "id", 4, 5000L) == 1L)
    // identical mirror: no new snapshot
    assert(IcebergInterop.exportIcebergBucketedIncremental(t, out, "id", 4, 5500L) == 1L)
    t.append(Seq((4L, "dd", 4.0), (5L, "ee", 5.0)).toDF("id", "k", "v"),
      tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergBucketedIncremental(t, out, "id", 4, 6000L) == 2L)
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "aa", 1.0), (2L, "bb", 2.0), (3L, "cc", 3.0),
        (4L, "dd", 4.0), (5L, "ee", 5.0)))
    // BUCKET PURITY across both snapshots: every row's spec hash matches
    // its file's directory
    val impure = spark.read.parquet(s"$out/data")
      .select(col("id"), col("_metadata.file_path").as("__p"),
        graft.functions.IcebergTransforms.bucket(4, col("id")).as("__b"))
      .where(!col("__p").contains(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("id_bucket="), col("__b"))))
      .count()
    assert(impure == 0L, s"$impure row(s) outside their spec bucket")
    // tuple-pruned read composes across snapshots
    val b5 = IcebergInterop.readIceberg(spark, out)
      .where(graft.functions.IcebergTransforms.bucket(4, col("id")) === 1)
      .count()
    assert(b5 >= 0L) // the hash landscape is opaque; purity above is the pin
    // a DIFFERENT bucket width refuses (spec mismatch)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergBucketedIncremental(t, out, "id", 8, 7000L))
      .getMessage.contains("re-export"))
    // source history rewrite (delete) removes mirrored files — refuses
    t.delete(col("id") === 1L, tsMillis = 3000L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.exportIcebergBucketedIncremental(t, out, "id", 4, 8000L))
      .getMessage.contains("re-export from scratch"))

    // the truncate twin over a string prefix
    val t2 = TxTable(spark, tmp("ice_trunc_incr"))
    t2.append(Seq((1L, "alpha", 1.0), (2L, "beta", 2.0)).toDF("id", "k", "v"),
      tsMillis = 1000L)
    val out2 = tmp("ice_trunc_incr_exp")
    assert(IcebergInterop.exportIcebergTruncatedIncremental(t2, out2, "k", 2, 5000L) == 1L)
    t2.append(Seq((3L, "alto", 3.0)).toDF("id", "k", "v"), tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergTruncatedIncremental(t2, out2, "k", 2, 6000L) == 2L)
    assert(IcebergInterop.readIceberg(spark, out2)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 1.0), (2L, "beta", 2.0), (3L, "alto", 3.0)))
    // prefix pruning sees BOTH eras' "al" files from the manifests alone
    assert(IcebergInterop.readIcebergPruned(spark, out2,
        keep = pv => pv.get("k_trunc").contains("al"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("partition spec evolution: flat -> day(ts), eras read and prune per spec-id") {
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val t = TxTable(spark, tmp("ice_evolve"))
    t.append(Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-02 10:00:00"), 2.0)).toDF("id", "ts", "v").coalesce(1),
      tsMillis = 1000L)
    val out = tmp("ice_evolve_exp")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)          // spec 0: flat
    // INSERT INTO under spec 0 (still flat)
    assert(IcebergInterop.appendIceberg(spark, out,
      Seq((3L, ts("2024-01-03 10:00:00"), 3.0)).toDF("id", "ts", "v"), 6000L) == 1L)
    // evolve: day(ts) becomes the DEFAULT spec; nothing rewrites
    assert(IcebergInterop.evolveIcebergSpecDay(spark, out, "ts", 7000L) == 1)
    // INSERT INTO under spec 1: derived ts_day dirs, tuples ride the manifest
    assert(IcebergInterop.appendIceberg(spark, out,
      Seq((4L, ts("2024-01-04 10:00:00"), 4.0),
        (5L, ts("2024-01-01 09:00:00"), 5.0)).toDF("id", "ts", "v"), 8000L) == 2L)
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq ==
      Seq((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-02 10:00:00"), 2.0),
        (3L, ts("2024-01-03 10:00:00"), 3.0), (4L, ts("2024-01-04 10:00:00"), 4.0),
        (5L, ts("2024-01-01 09:00:00"), 5.0)))
    // pruning resolves PER SPEC-ID: the day-era file for 01-01 prunes out,
    // old-era files (whose tuples carry no day) keep CONSERVATIVELY
    val pruned = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("ts_day").contains(java.sql.Date.valueOf("2024-01-04")))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(pruned.inputFiles.length < live.inputFiles.length,
      "day-era pruning must shrink the file list across the evolution")
    // evolving to the spec the table already defaults to refuses loudly
    assert(intercept[IllegalArgumentException](
      IcebergInterop.evolveIcebergSpecDay(spark, out, "ts", 9000L))
      .getMessage.contains("no-op"))
    // the MERGE stages under the evolved spec: old-era id 2 eq-deletes,
    // its replacement lands in its derived day partition
    val (nk, na) = IcebergInterop.upsertIceberg(spark, out,
      Seq((2L, ts("2024-01-05 00:00:00"), 20.0)).toDF("id", "ts", "v"),
      Seq("id"), 10000L)
    assert((nk, na) == ((1L, 1L)))
    assert(IcebergInterop.readIcebergPruned(spark, out,
        keep = pv => pv.get("ts_day").contains(java.sql.Date.valueOf("2024-01-05")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "old-era files keep conservatively, the eq-delete applies inside them")
    // COMPACTION still refuses the mixed-spec table (its carried entries
    // re-list under one manifest header), pointing at the migration
    assert(intercept[IllegalArgumentException](
      IcebergInterop.compactIcebergDeletes(spark, out, 10500L))
      .getMessage.contains("rewriteIcebergData"))
    // the FULL rewrite converts the table to ONE spec (round-13): every
    // file re-derives its ts_day tuple under the current default spec,
    // the upsert's global eq-delete folds in, and the live view is
    // unchanged
    val (nfRw, deadRw) = IcebergInterop.rewriteIcebergData(spark, out, 11000L)
    assert(nfRw >= 1 && deadRw == 1L, s"got ($nfRw, $deadRw)")
    val after = IcebergInterop.readIceberg(spark, out)
    assert(after.orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq ==
      Seq((1L, ts("2024-01-01 10:00:00"), 1.0), (2L, ts("2024-01-05 00:00:00"), 20.0),
        (3L, ts("2024-01-03 10:00:00"), 3.0), (4L, ts("2024-01-04 10:00:00"), 4.0),
        (5L, ts("2024-01-01 09:00:00"), 5.0)))
    // single-spec now: EVERY file prunes by day — the 01-05 read plans
    // exactly the one rewritten file, no conservative old-era keeps
    val prunedAfter = IcebergInterop.readIcebergPruned(spark, out,
      keep = pv => pv.get("ts_day").contains(java.sql.Date.valueOf("2024-01-05")))
    assert(prunedAfter.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(prunedAfter.inputFiles.length == 1,
      "post-rewrite pruning must be exact — no old-era conservative keeps")
    // and the table is compactable again (delete-free: no-op)
    assert(IcebergInterop.compactIcebergDeletes(spark, out, 12000L) == ((0, 0L)))
  }

  test("upsertIceberg onto a composite day+identity spec keeps both layouts") {
    def ts(v: String) = java.sql.Timestamp.valueOf(v)
    val t = TxTable(spark, tmp("ice_upsert_comp"))
    t.append(Seq((1L, ts("2024-01-01 10:00:00"), "a", 1.0),
        (2L, ts("2024-01-01 11:00:00"), "b", 2.0),
        (3L, ts("2024-01-02 10:00:00"), "a", 3.0))
      .toDF("id", "ts", "k", "v"), tsMillis = 1000L)
    val out = tmp("ice_upsert_comp_exp")
    IcebergInterop.exportIcebergDayIdentity(t, out, "ts", "k", tsMillis = 5000L)
    val up = Seq((2L, ts("2024-01-03 09:00:00"), "c", 20.0),
      (7L, ts("2024-01-01 12:00:00"), "a", 7.0)).toDF("id", "ts", "k", "v")
    val (nk, na) = IcebergInterop.upsertIceberg(spark, out, up, Seq("id"), 6000L)
    assert((nk, na) == ((2L, 2L)))
    val live = IcebergInterop.readIceberg(spark, out)
    assert(live.orderBy("id").as[(Long, java.sql.Timestamp, String, Double)]
      .collect().toSeq == Seq(
        (1L, ts("2024-01-01 10:00:00"), "a", 1.0),
        (2L, ts("2024-01-03 09:00:00"), "c", 20.0),
        (3L, ts("2024-01-02 10:00:00"), "a", 3.0),
        (7L, ts("2024-01-01 12:00:00"), "a", 7.0)))
    // identity column k is PROJECTED out of the staged bytes, ts stays
    val upsertFiles = Files.walk(Paths.get(out, "data")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("upsert-")).toSeq
    assert(upsertFiles.nonEmpty && upsertFiles.forall(p =>
      p.toString.contains("ts_day=") && p.toString.contains("k=")))
    upsertFiles.foreach { p =>
      val cols = spark.read.parquet(p.toString).columns.toSet
      assert(cols == Set("id", "ts", "v"), s"$p carries $cols")
    }
    // two-dimensional tuple pruning composes with the upsert's eq-delete
    val pruned = IcebergInterop.readIcebergPruned(spark, out,
      tuple => (tuple("ts_day"), tuple("k")) match {
        case (d: java.sql.Date, k: String) =>
          d == java.sql.Date.valueOf("2024-01-01") && k == "a"
        case _ => true
      })
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 7L))
  }

  test("changelog over a partitioned table: insert and delete edges fill projected columns") {
    val t = TxTable(spark, tmp("ice_pclog"))
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v"),
      tsMillis = 1000L, partitionBy = Seq("k"))
    val out = tmp("ice_pclog_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, 5000L) == 1L)   // snap1
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap1 = """"snapshot-id" : (\d+)""".r.findFirstMatchIn(v1Txt).get.group(1).toLong
    t.append(Seq((3L, "a", 3.0)).toDF("id", "k", "v"),
      tsMillis = 2000L, partitionBy = Seq("k"))
    assert(IcebergInterop.exportIcebergIncremental(t, out, 6000L) == 2L)   // snap2
    assert(IcebergInterop.deleteFromIceberg(spark, out,
      col("k") === "a" && col("v") < 2.0, 7000L) == 1L)                    // snap3
    val (_, log) = IcebergInterop.readIcebergChangelog(spark, out, snap1)
    val rows = log.select("id", "k", "_change_type", "_change_ordinal")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows == Set((3L, "a", "insert", 1L), (1L, "a", "delete", 2L)),
      s"got $rows")
  }

  test("snapshot refs: tags resolve, survive engine commits, root retention at expiry") {
    val t = TxTable(spark, tmp("ice_refs_src"))
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), tsMillis = 1000L)
    val out = tmp("ice_refs_exp")
    assert(IcebergInterop.exportIcebergIncremental(t, out, 5000L) == 1L)   // snap1
    t.append(Seq((3L, 3.0)).toDF("id", "v"), tsMillis = 2000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, 6000L) == 2L)   // snap2
    t.append(Seq((4L, 4.0)).toDF("id", "v"), tsMillis = 3000L)
    assert(IcebergInterop.exportIcebergIncremental(t, out, 7000L) == 3L)   // snap3
    val snap1 = IcebergInterop.icebergSnapshotAt(out, 5000L)
    val snap2 = IcebergInterop.icebergSnapshotAt(out, 6000L)
    val snap3 = IcebergInterop.icebergRef(out, "main")    // default branch = current
    assert(snap3 == IcebergInterop.icebergSnapshotAt(out, 7000L))
    // a tag on the first snapshot, a branch on the second
    IcebergInterop.setIcebergRef(out, "audit", snap1, "tag", 8000L)
    IcebergInterop.setIcebergRef(out, "wap", snap2, "branch", 8001L)
    assert(IcebergInterop.icebergRefs(out) ==
      Map("audit" -> ((snap1, "tag")), "wap" -> ((snap2, "branch"))))
    assert(IcebergInterop.readIceberg(spark, out,
        snapshotAsOf = Some(IcebergInterop.icebergRef(out, "audit")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // unknown names are loud, and a nonexistent target refuses at set
    assert(intercept[IllegalArgumentException](
      IcebergInterop.icebergRef(out, "nope")).getMessage.contains("no ref"))
    assert(intercept[IllegalArgumentException](
      IcebergInterop.setIcebergRef(out, "x", 123456L))
      .getMessage.contains("does not exist"))
    // an EXPLICIT main ref (what Iceberg Java always records) must
    // ADVANCE with the commit — a stale main bricks the table for its
    // own writer ("Current snapshot ID does not match main branch")
    IcebergInterop.setIcebergRef(out, "main", snap3, "branch", 8002L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.setIcebergRef(out, "main", snap3, "tag"))
      .getMessage.contains("BRANCH"))
    // refs survive an engine commit (the key delete rewrites metadata)
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(4L).toDF("id"), tsMillis = 9000L) == 1L)                         // snap4
    assert(IcebergInterop.icebergRefs(out).keySet == Set("audit", "wap", "main"))
    val mainAfter = IcebergInterop.icebergRefs(out)("main")._1
    assert(mainAfter != snap3 &&
      mainAfter == IcebergInterop.icebergRef(out, "main"),
      "the main branch ref must advance with the commit")
    // expiry: keepLast=1 keeps the CURRENT snapshot plus both ref roots;
    // only the unreferenced snap3 expires, and the ref'd views still read
    val (nExp, _, _) = IcebergInterop.expireIcebergSnapshots(spark, out,
      keepLast = 1, tsMillis = 10000L)
    assert(nExp == 1, s"expected only snap3 to expire, got $nExp")
    assert(IcebergInterop.readIceberg(spark, out,
        snapshotAsOf = Some(IcebergInterop.icebergRef(out, "audit")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(IcebergInterop.readIceberg(spark, out,
        snapshotAsOf = Some(IcebergInterop.icebergRef(out, "wap")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(IcebergInterop.readIceberg(spark, out).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(intercept[Exception](IcebergInterop.readIceberg(spark, out,
      snapshotAsOf = Some(snap3)).collect()).getMessage.contains("does not exist"))
    // dropping the refs releases the roots: the next expiry reclaims them
    IcebergInterop.dropIcebergRef(out, "audit", 11000L)
    IcebergInterop.dropIcebergRef(out, "wap", 11001L)
    assert(intercept[IllegalArgumentException](
      IcebergInterop.dropIcebergRef(out, "audit")).getMessage.contains("no ref"))
    val (nExp2, _, _) = IcebergInterop.expireIcebergSnapshots(spark, out,
      keepLast = 1, tsMillis = 12000L)
    assert(nExp2 == 2)
    assert(IcebergInterop.readIceberg(spark, out).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("tailIcebergCdcInto: upsert + key-delete edges land in a keyed sink exactly-once") {
    val t = TxTable(spark, tmp("ice_cdc_src"))
    t.append(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
      (4L, "c", 40.0)).toDF("id", "k", "v"), tsMillis = 1000L)
    val out = tmp("ice_cdc_tail")
    IcebergInterop.exportIceberg(t, out, tsMillis = 5000L)                  // snap0
    val v1Txt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val snap0 = """"snapshot-id" : (\d+)""".r
      .findFirstMatchIn(v1Txt).get.group(1).toLong
    // bootstrap: full copy at snap0 (the changelog replays only what
    // comes AFTER an ancestor snapshot)
    val sink = TxTable(spark, tmp("ice_cdc_sink"))
    sink.append(IcebergInterop.readIceberg(spark, out), tsMillis = 500L)
    // a poll with nothing new is a no-op that records no watermark
    assert(IcebergInterop.tailIcebergCdcInto(spark, out, sink, Seq("id"),
      snap0, tsMillis = 1000L) == snap0)
    // upstream: one MERGE (replace id 2, insert id 9 — an overwrite
    // snapshot with equality deletes) and one key delete (id 1) — the
    // commits the append-only tail refuses
    assert(IcebergInterop.upsertIceberg(spark, out,
      Seq((2L, "x", 200.0), (9L, "y", 900.0)).toDF("id", "k", "v"),
      Seq("id"), 6000L) == ((2L, 2L)))                                      // snap1
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(1L).toDF("id"), tsMillis = 7000L) == 1L)                          // snap2
    // ONE poll drains both snapshots: the overwrite's delete+insert pair
    // nets to the replacement, the eq-delete edge to a key removal
    val w1 = IcebergInterop.tailIcebergCdcInto(spark, out, sink, Seq("id"),
      snap0, tsMillis = 2000L)
    assert(w1 != snap0)
    val want = Seq((2L, "x", 200.0), (3L, "a", 30.0), (4L, "c", 40.0),
      (9L, "y", 900.0))
    assert(sink.read().orderBy("id").as[(Long, String, Double)].collect().toSeq
      == want, "the materialized sink must equal the upstream live view")
    assert(IcebergInterop.readIceberg(spark, out).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq == want)
    // a replayed poll with the STALE snap0 watermark cannot duplicate:
    // the sink's recorded metadata version is authoritative
    assert(IcebergInterop.tailIcebergCdcInto(spark, out, sink, Seq("id"),
      snap0, tsMillis = 3000L) == w1)
    assert(sink.read().count() == 4L)
    // the tail resumes: a later upstream delete lands on the next poll
    assert(IcebergInterop.deleteFromIcebergByKey(spark, out,
      Seq(9L).toDF("id"), tsMillis = 8000L) == 1L)                          // snap3
    val w2 = IcebergInterop.tailIcebergCdcInto(spark, out, sink, Seq("id"),
      snap0, tsMillis = 4000L)
    assert(w2 != w1)
    assert(sink.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L))
    // the recorded txn version resolves to the head ACTUALLY read
    val ver = sink.txnVersion(s"graft-iceberg-cdc-tail|$out").get
    val vTxt = new String(Files.readAllBytes(
      Paths.get(out, "metadata", s"v$ver.metadata.json")))
    assert(s""""current-snapshot-id" : $w2""".r.findFirstIn(vTxt).nonEmpty,
      s"txn version $ver must be the metadata version whose head is $w2")
    // continuous ≡ batch: one replay from the bootstrap snapshot into a
    // fresh seeded sink lands the identical materialization
    val oneShot = TxTable(spark, tmp("ice_cdc_oneshot"))
    oneShot.append(IcebergInterop.readIceberg(spark, out,
      snapshotAsOf = Some(snap0)), tsMillis = 500L)
    assert(IcebergInterop.tailIcebergCdcInto(spark, out, oneShot, Seq("id"),
      snap0, tsMillis = 5000L) == w2)
    assert(oneShot.read().orderBy("id").as[(Long, String, Double)].collect().toSeq
      == sink.read().orderBy("id").as[(Long, String, Double)].collect().toSeq,
      "the incremental tail must equal the one-shot batch replay")
  }
}
