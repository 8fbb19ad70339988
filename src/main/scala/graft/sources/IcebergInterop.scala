package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Open-format interop #2: Apache Iceberg (the other half of the
  * "Delta/Iceberg" north star; [[DeltaInterop]] is the first). Export a
  * [[TxTable]] snapshot as a standard HADOOP-LAYOUT Iceberg v1 table any
  * external engine can read (Spark's Iceberg connector, Trino, DuckDB's
  * iceberg extension, pyiceberg), and read a standard Iceberg table
  * written by those engines back into a DataFrame.
  *
  * The layout follows the published Iceberg table spec (iceberg.apache.org
  * /spec; Hadoop-catalog file layout): `metadata/vN.metadata.json`
  * describes schema + snapshots, `version-hint.text` names the current
  * version, each snapshot points at an Avro MANIFEST LIST whose entries
  * point at Avro MANIFESTS listing the parquet data files. Field-ids ride
  * the schema JSON and the Avro `field-id` props exactly as the spec
  * requires, so a real Iceberg reader resolves columns by id.
  *
  * Implementation is original and dependency-free beyond Spark-bundled
  * Jackson + Avro (no Iceberg jars ship with this environment). Same
  * hard-link discipline as the Delta exporter: a 100 TB export moves zero
  * data bytes. Manifests are driver-side METADATA (O(files), the same
  * scale class as Iceberg's own planning path).
  *
  * Reader scope, enforced loudly (misreading an advanced table is
  * corruption, not compatibility): format-version 1-2; data content only
  * (v2 positional/equality DELETE files are rejected); schema resolved
  * from the current metadata; identity partitioning reads through because
  * Iceberg data files physically carry all columns. Unknown/fancy types
  * (uuid, fixed, time) are rejected at schema conversion.
  */
object IcebergInterop {

  private def mapper = new ObjectMapper()

  // ------------------------------------------------------------- EXPORT

  /** Write the CURRENT snapshot of `t` at `target` as a single-snapshot
    * Iceberg v1 table. Rebuilt from scratch per call (snapshot semantics,
    * like [[DeltaInterop.exportDelta]]) with the same rename-aside swap:
    * a failed swap leaves the previous export intact. */
  def exportIceberg(t: TxTable, target: String,
      tsMillis: Long = System.currentTimeMillis()): Unit = {
    val snap = t.snapshotInfo()
    // a Hive-partitioned source drops the partition column FROM the data
    // files; this writer declares an empty partition spec and relies on
    // the parquet carrying every column, so exporting such a table would
    // silently produce an Iceberg table missing a column — refuse instead
    // (the Delta exporter handles partitioned layouts; use that, or
    // compact the partition column back into the data first)
    require(snap.partCols.isEmpty,
      s"cannot export a partitioned TxTable (${snap.partCols.mkString(",")}) " +
        "to Iceberg: partition values live in directory names, not the data " +
        "files, and this writer emits an unpartitioned spec — use the Delta " +
        "exporter for partitioned layouts")
    val schema = StructType.fromDDL(snap.schemaDdl)
    val finalDir = Paths.get(target).toAbsolutePath
    Files.createDirectories(finalDir.getParent)
    val staging = finalDir.resolveSibling(
      finalDir.getFileName.toString +
        s".staging-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    val metaDir = staging.resolve("metadata")
    val dataDir = staging.resolve("data")
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)

    val srcData = Paths.get(snap.dataDir)
    val files = snap.files.map { rel =>
      val src = srcData.resolve(rel)
      val dst = dataDir.resolve(rel)
      Files.createDirectories(dst.getParent)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING) }
      (rel, Files.size(dst), parquetRowCount(t.spark, dst))
    }

    // snapshot id: content-determined so identical exports are identical
    val snapshotId = math.abs(java.util.UUID.nameUUIDFromBytes(
      (target + "|" + snap.files.mkString(",")).getBytes("UTF-8"))
      .getMostSignificantBits)

    // ---- manifest (one, listing every data file) — Avro container file
    val icebergSchemaJson = mapper.writeValueAsString(icebergSchema(mapper, schema))
    val manifestName = f"graft-m0-$snapshotId%d.avro"
    val manifestPath = metaDir.resolve(manifestName)
    writeManifest(manifestPath, snapshotId, icebergSchemaJson,
      files.map { case (rel, size, rows) =>
        // file_path is a full URI per spec; the FINAL location, not staging
        (finalDir.resolve("data").resolve(rel).toUri.toString, size, rows)
      })

    // ---- manifest list
    val listName = f"snap-$snapshotId%d.avro"
    val listPath = metaDir.resolve(listName)
    writeManifestList(listPath, snapshotId,
      finalDir.resolve("metadata").resolve(manifestName).toUri.toString,
      Files.size(manifestPath))

    // ---- vN.metadata.json + version-hint.text
    val m = mapper
    val root = m.createObjectNode()
    root.put("format-version", 1)
    root.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      target.getBytes("UTF-8")).toString)
    root.put("location", finalDir.toUri.toString.stripSuffix("/"))
    root.put("last-updated-ms", tsMillis)
    root.put("last-column-id", schema.fields.length)
    val schemaNode = icebergSchema(m, schema)
    root.set[ObjectNode]("schema", schemaNode)
    val schemas = root.putArray("schemas")
    schemas.add(icebergSchema(m, schema))
    root.put("current-schema-id", 0)
    root.putArray("partition-spec") // v1 legacy field (unpartitioned)
    val specs = root.putArray("partition-specs")
    val spec0 = m.createObjectNode()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    specs.add(spec0)
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 999)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    val s0 = m.createObjectNode()
    s0.put("snapshot-id", snapshotId)
    s0.put("timestamp-ms", tsMillis)
    s0.put("manifest-list",
      finalDir.resolve("metadata").resolve(listName).toUri.toString)
    val summary = s0.putObject("summary")
    summary.put("operation", "append")
    snaps.add(s0)
    Files.write(metaDir.resolve("v1.metadata.json"),
      Seq(m.writerWithDefaultPrettyPrinter().writeValueAsString(root)).asJava)
    Files.write(metaDir.resolve("version-hint.text"), Seq("1").asJava)

    // swap into place, previous export renamed aside until the new one is in
    val backup = finalDir.resolveSibling(
      finalDir.getFileName.toString + s".old-${System.nanoTime()}")
    val hadPrev = Files.exists(finalDir)
    if (hadPrev) Files.move(finalDir, backup)
    try {
      try Files.move(staging, finalDir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(staging, finalDir)
      }
    } catch { case e: Throwable =>
      if (hadPrev && !Files.exists(finalDir)) Files.move(backup, finalDir)
      throw e
    }
    if (hadPrev) deleteRecursively(backup)
  }

  /** Append the CURRENT snapshot of `t` to an EXISTING Iceberg export at
    * `target` as a NEW SNAPSHOT (the Hadoop-catalog commit protocol:
    * write `v(N+1).metadata.json`, then flip `version-hint.text`) —
    * the second open format's incremental story, matching
    * [[DeltaInterop.exportDeltaIncremental]]. Falls back to a full
    * [[exportIceberg]] when no table exists yet.
    *
    * Data bytes move O(changed files) (hard links); snapshot metadata is
    * O(live files) per export — one fresh manifest describing the whole
    * live set, the same driver-metadata class as a Delta checkpoint (and
    * exactly what Iceberg's own manifest-rewrite maintenance produces).
    * Prior snapshots stay in the metadata, so [[readIceberg]]'s
    * `snapshotAsOf` time-travels across exports; like the Delta mirror,
    * data files the source dropped are physically retired after the
    * commit, so old snapshots referencing them become unreadable (a
    * vacuumed table) while a directory glob always equals the latest
    * snapshot.
    *
    * Schema evolution rides along when it is append-only (new columns at
    * the end — TxTable's evolve contract), which keeps the positional
    * field-ids stable; any other shape change would silently renumber
    * ids, so it fails loudly instead. The new metadata version is
    * published with CREATE_NEW — a racing exporter collides on the
    * version file and fails loudly rather than clobbering.
    *
    * @return the metadata version now current (1 for a fresh full export;
    *   unchanged when the mirror is already identical). */
  def exportIcebergIncremental(t: TxTable, target: String,
      tsMillis: Long = System.currentTimeMillis()): Long = {
    val finalDir = Paths.get(target).toAbsolutePath
    val metaDir = finalDir.resolve("metadata")
    if (!Files.isDirectory(metaDir)) { exportIceberg(t, target, tsMillis); return 1L }

    val snap = t.snapshotInfo()
    require(snap.partCols.isEmpty,
      s"cannot export a partitioned TxTable (${snap.partCols.mkString(",")}) " +
        "to Iceberg — see exportIceberg")
    val schema = StructType.fromDDL(snap.schemaDdl)
    val meta = currentMetadata(metaDir, target)
    // the mirror only appends to a table THIS writer's format produced —
    // a foreign v2 table could carry delete files (whose manifests this
    // path would misread as data, silently resurrecting deleted rows) or
    // a partition spec the writer cannot express. Fail loudly, matching
    // readIceberg's stance.
    val fv = meta.get("format-version").asInt
    require(fv == 1,
      s"cannot incrementally export onto a format-version $fv Iceberg table " +
        s"at $target — this writer produces v1; re-export from scratch")
    val specsOk = Option(meta.get("partition-specs")).forall(
      _.elements().asScala.forall(sp =>
        Option(sp.get("fields")).forall(!_.elements().hasNext)))
    require(specsOk,
      s"cannot incrementally export onto a PARTITIONED Iceberg table at $target")
    val prevVersion = currentMetadataVersion(metaDir, target)
    val prevSchema = currentSparkSchema(meta, target)
    require(prevSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.take(prevSchema.fields.length).map(f => (f.name, f.dataType)).toSeq,
      s"schema change at $target is not append-only (prev " +
        s"${prevSchema.fieldNames.mkString(",")} vs ${schema.fieldNames.mkString(",")}) " +
        "— positional field-ids would renumber; re-export from scratch")

    val prevSnapId = Option(meta.get("current-snapshot-id")).map(_.asLong).filter(_ != -1L)
    val prevSnapNode = prevSnapId.flatMap { id =>
      Option(meta.get("snapshots")).flatMap(
        _.elements().asScala.find(_.get("snapshot-id").asLong == id))
    }
    val dataDir = finalDir.resolve("data")
    // current live set as (rel name under data/, size, rows) — sizes and
    // record counts RIDE the prior manifest, so unchanged files cost no
    // footer re-read and the export is genuinely O(changed files)
    val live: Seq[(String, Long, Long)] = prevSnapNode.toSeq.flatMap { sn =>
      val listPath = resolveUri(finalDir, sn.get("manifest-list").asText)
      readAvro(listPath).flatMap { r =>
        readAvro(resolveUri(finalDir, r.get("manifest_path").toString)).flatMap { entry =>
          val status = entry.get("status").asInstanceOf[Int]
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").asInstanceOf[Int]).getOrElse(0)
          require(content == 0,
            s"Iceberg table at $target carries delete files — cannot mirror onto it")
          if (status == 2) None
          else {
            // a manifest may legally reference files OUTSIDE <target>/data
            // (moved tables, foreign warehouses); relativize would produce
            // ../ names and the removal pass would DELETE FILES OUTSIDE
            // THE EXPORT — refuse instead of escaping the directory
            val p = resolveUri(finalDir, df.get("file_path").toString)
              .toAbsolutePath.normalize
            require(p.startsWith(dataDir.toAbsolutePath.normalize),
              s"existing manifest references $p outside $dataDir — " +
                "not a self-contained mirror; re-export from scratch")
            Some((dataDir.relativize(p).toString,
              df.get("file_size_in_bytes").asInstanceOf[Long],
              df.get("record_count").asInstanceOf[Long]))
          }
        }
      }
    }
    val liveStats = live.map { case (rel, sz, rc) => rel -> (sz, rc) }.toMap
    val snapSet = snap.files.toSet
    val newFiles = snap.files.filterNot(liveStats.contains)
    val removedFiles = live.map(_._1).filterNot(snapSet)
    val schemaChanged = prevSchema != schema
    if (newFiles.isEmpty && removedFiles.isEmpty && !schemaChanged) return prevVersion

    val srcData = Paths.get(snap.dataDir)
    val files = snap.files.map { rel =>
      val dst = dataDir.resolve(rel)
      if (!Files.exists(dst)) {
        Files.createDirectories(dst.getParent)
        try Files.createLink(dst, srcData.resolve(rel))
        catch { case _: Exception => Files.copy(srcData.resolve(rel), dst) }
      }
      liveStats.get(rel) match {
        case Some((sz, rc)) => (rel, sz, rc) // carried from the prior manifest
        case None           => (rel, Files.size(dst), parquetRowCount(t.spark, dst))
      }
    }

    val m = mapper
    val snapshotId = math.abs(java.util.UUID.nameUUIDFromBytes(
      (target + "|" + prevVersion + "|" + snap.files.mkString(",")).getBytes("UTF-8"))
      .getMostSignificantBits)
    val icebergSchemaJson = m.writeValueAsString(icebergSchema(m, schema))
    val manifestName = f"graft-m0-$snapshotId%d.avro"
    writeManifest(metaDir.resolve(manifestName), snapshotId, icebergSchemaJson,
      files.map { case (rel, size, rows) =>
        (dataDir.resolve(rel).toUri.toString, size, rows)
      })
    val listName = f"snap-$snapshotId%d.avro"
    writeManifestList(metaDir.resolve(listName), snapshotId,
      metaDir.resolve(manifestName).toUri.toString,
      Files.size(metaDir.resolve(manifestName)))

    // new metadata = previous metadata with the schema refreshed and the
    // new snapshot appended (prior snapshots kept: snapshotAsOf history)
    val root = meta.deepCopy[ObjectNode]()
    root.put("last-updated-ms", tsMillis)
    root.put("last-column-id", schema.fields.length)
    root.set[ObjectNode]("schema", icebergSchema(m, schema))
    val schemas = root.putArray("schemas")
    schemas.add(icebergSchema(m, schema))
    root.put("current-schema-id", 0)
    root.put("current-snapshot-id", snapshotId)
    val snaps = Option(root.get("snapshots")) match {
      case Some(a: ArrayNode) => a
      case _                  => root.putArray("snapshots")
    }
    val s0 = m.createObjectNode()
    s0.put("snapshot-id", snapshotId)
    prevSnapId.foreach(s0.put("parent-snapshot-id", _))
    s0.put("timestamp-ms", tsMillis)
    s0.put("manifest-list", metaDir.resolve(listName).toUri.toString)
    s0.putObject("summary").put("operation", "append")
    snaps.add(s0)

    val newVersion = prevVersion + 1
    // CREATE_NEW = put-if-absent publish; version-hint flips LAST (readers
    // on the old hint simply see the previous consistent version)
    Files.write(metaDir.resolve(s"v$newVersion.metadata.json"),
      Seq(m.writerWithDefaultPrettyPrinter().writeValueAsString(root)).asJava,
      java.nio.file.StandardOpenOption.CREATE_NEW)
    Files.write(metaDir.resolve("version-hint.text"), Seq(newVersion.toString).asJava)
    removedFiles.foreach(rel => Files.deleteIfExists(dataDir.resolve(rel)))
    newVersion
  }

  /** The metadata version named by version-hint.text (or the highest vN
    * present) — the number the NEXT commit increments. */
  private def currentMetadataVersion(metaDir: Path, path: String): Long = {
    val hint = metaDir.resolve("version-hint.text")
    val fromHint =
      if (!Files.isRegularFile(hint)) None
      else scala.util.Try(
        Files.readAllLines(hint).asScala.head.trim.toLong).toOption
        .filter(v => Files.isRegularFile(metaDir.resolve(s"v$v.metadata.json")))
    fromHint.getOrElse {
      val V = """v(\d+)\.metadata\.json""".r
      val s = Files.list(metaDir)
      try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
        case V(v) => Some(v.toLong)
        case _    => None
      }).toSeq.sorted.lastOption.getOrElse(
        throw new IllegalArgumentException(s"no vN.metadata.json at $path"))
      finally s.close()
    }
  }

  /** Spark StructType -> Iceberg schema JSON (top level only needs flat
    * field-ids for the types [[TxTable]] stores; nested types fail loudly
    * rather than export something another engine would misread). */
  private def icebergSchema(m: ObjectMapper, schema: StructType): ObjectNode = {
    val node = m.createObjectNode()
    node.put("type", "struct")
    node.put("schema-id", 0)
    val fields: ArrayNode = node.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = m.createObjectNode()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", icebergType(f.dataType, f.name))
      fields.add(fn)
    }
    node
  }

  private def icebergType(t: DataType, where: String): String = t match {
    case BooleanType      => "boolean"
    case IntegerType      => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case StringType       => "string"
    case DateType         => "date"
    case TimestampType    => "timestamptz"
    case TimestampNTZType => "timestamp"
    case BinaryType       => "binary"
    case d: DecimalType   => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"column '$where' has type $other — not exportable to Iceberg by this writer")
  }

  /** Per-file row count from the parquet footer — metadata-scale driver
    * reads (Iceberg's own planning reads the same footers). O(files)
    * sequential footer reads bound the export: fine through the ~800k
    * files of a 128 MB/file 100 TB table on local storage; an
    * object-store deployment at that count would parallelize this via a
    * small Spark job over the file list (the record counts could also be
    * carried in the TxTable commit stats to make this free). */
  private def parquetRowCount(spark: SparkSession, p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val in = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf))
    try in.getRecordCount
    finally in.close()
  }

  // Avro schemas for the v1 manifest list / manifest, field-ids included
  // as the spec requires (a real reader resolves these columns by id).
  private val ManifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503}
      |]}""".stripMargin)

  // block_size_in_bytes (field-id 105) is REQUIRED in the v1 data_file
  // record: real readers' v1 read schema has no default for it, so a
  // manifest lacking it fails Avro schema resolution (round-7 review).
  private val ManifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104},
      |  {"name":"block_size_in_bytes","type":"long","field-id":105}
      |]},"field-id":2}
      |]}""".stripMargin)

  private def writeManifestList(path: Path, snapshotId: Long,
      manifestUri: String, manifestLen: Long): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](ManifestListSchema))
    w.setMeta("format-version", "1")
    w.create(ManifestListSchema, path.toFile)
    try {
      val r = new GenericData.Record(ManifestListSchema)
      r.put("manifest_path", manifestUri)
      r.put("manifest_length", manifestLen)
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      w.append(r)
    } finally w.close()
  }

  private def writeManifest(path: Path, snapshotId: Long, schemaJson: String,
      files: Seq[(String, Long, Long)]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](ManifestSchema))
    // the spec'd manifest file metadata: readers resolve projection and
    // partitioning from these keys, not just the Avro writer schema
    w.setMeta("format-version", "1")
    w.setMeta("schema", schemaJson)
    w.setMeta("partition-spec", "[]")
    w.setMeta("partition-spec-id", "0")
    w.create(ManifestSchema, path.toFile)
    try files.foreach { case (uri, size, rows) =>
      val entry = new GenericData.Record(ManifestSchema)
      entry.put("status", 1) // ADDED
      entry.put("snapshot_id", snapshotId)
      val dfSchema = ManifestSchema.getField("data_file").schema()
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", uri)
      df.put("file_format", "PARQUET")
      df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
      df.put("record_count", rows)
      df.put("file_size_in_bytes", size)
      df.put("block_size_in_bytes", 134217728L) // the conventional 128 MiB
      entry.put("data_file", df)
      w.append(entry)
    } finally w.close()
  }

  // --------------------------------------------------------------- READ

  /** Read a standard Iceberg table at `path` (Hadoop layout) into a
    * DataFrame — the current snapshot, or `snapshotAsOf` (time travel over
    * the snapshot log). Fails loudly on delete files, format-version > 2,
    * and unconvertible types. */
  def readIceberg(spark: SparkSession, path: String,
      snapshotAsOf: Option[Long] = None): DataFrame = {
    val root = Paths.get(path).toAbsolutePath
    val metaDir = root.resolve("metadata")
    require(Files.isDirectory(metaDir), s"no Iceberg table at $path (missing metadata/)")

    val meta = currentMetadata(metaDir, path)
    val fv = meta.get("format-version").asInt
    require(fv == 1 || fv == 2,
      s"Iceberg table $path has format-version $fv — only v1/v2 are supported")

    val schema = currentSparkSchema(meta, path)

    val snapNode = {
      val snaps = Option(meta.get("snapshots"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      snapshotAsOf match {
        case Some(id) =>
          snaps.find(_.get("snapshot-id").asLong == id).getOrElse(
            throw new IllegalArgumentException(
              s"snapshot $id does not exist in the Iceberg table at $path"))
        case None =>
          val cur = Option(meta.get("current-snapshot-id")).map(_.asLong)
            .filter(_ != -1L)
          cur.flatMap(c => snaps.find(_.get("snapshot-id").asLong == c))
            .getOrElse(return spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
      }
    }

    val listUri = snapNode.get("manifest-list")
    require(listUri != null,
      s"Iceberg table $path uses inline v1 'manifests' lists without a " +
        "manifest-list file — unsupported by this reader")
    val listPath = resolveUri(root, listUri.asText)
    val manifests = readAvro(listPath).map { r =>
      resolveUri(root, r.get("manifest_path").toString)
    }

    val dataFiles = manifests.flatMap { mp =>
      readAvro(mp).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        // v2 manifests carry data_file.content: 0=data, 1=position deletes,
        // 2=equality deletes. A table with live delete files CANNOT be read
        // correctly by scanning data files alone.
        val content = Option(df.getSchema.getField("content"))
          .map(f => df.get("content").asInstanceOf[Int]).getOrElse(0)
        require(content == 0,
          s"Iceberg table $path carries delete files (content=$content) — " +
            "row-level deletes are unsupported by this reader")
        val fmt = df.get("file_format").toString
        require(fmt.equalsIgnoreCase("PARQUET"),
          s"Iceberg table $path holds $fmt data files — only parquet is supported")
        if (status == 2) None // DELETED entry
        else Some(resolveUri(root, df.get("file_path").toString).toString)
      }
    }

    if (dataFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dataFiles: _*)
  }

  /** `metadata/vN.metadata.json` named by version-hint.text, else the
    * highest vN present (the Hadoop-catalog fallback real readers use). */
  private def currentMetadata(metaDir: Path, path: String): JsonNode = {
    val hint = metaDir.resolve("version-hint.text")
    val fromHint =
      if (!Files.isRegularFile(hint)) None
      else scala.util.Try {
        val v = Files.readAllLines(hint).asScala.head.trim.toLong
        metaDir.resolve(s"v$v.metadata.json")
      }.toOption.filter(Files.isRegularFile(_))
    val metaFile = fromHint.orElse {
      val V = """v(\d+)\.metadata\.json""".r
      val s = Files.list(metaDir)
      try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
        case V(v) => Some((v.toLong, p))
        case _    => None
      }).toSeq.sortBy(_._1).lastOption.map(_._2)
      finally s.close()
    }.getOrElse(throw new IllegalArgumentException(
      s"no vN.metadata.json in the Iceberg table at $path"))
    mapper.readTree(Files.readAllBytes(metaFile))
  }

  private def currentSparkSchema(meta: JsonNode, path: String): StructType = {
    val schemaNode = Option(meta.get("schemas")).flatMap { arr =>
      val want = Option(meta.get("current-schema-id")).map(_.asInt).getOrElse(0)
      arr.elements().asScala.find(s =>
        Option(s.get("schema-id")).forall(_.asInt == want))
    }.orElse(Option(meta.get("schema"))).getOrElse(
      throw new IllegalArgumentException(s"Iceberg table $path carries no schema"))
    structOf(schemaNode, path)
  }

  private def structOf(node: JsonNode, path: String): StructType =
    StructType(node.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText,
        sparkType(f.get("type"), path),
        nullable = !Option(f.get("required")).exists(_.asBoolean))
    }.toSeq)

  /** Iceberg type JSON -> Spark type; anything not listed fails loudly. */
  private def sparkType(t: JsonNode, path: String): DataType =
    if (t.isTextual) t.asText match {
      case "boolean"     => BooleanType
      case "int"         => IntegerType
      case "long"        => LongType
      case "float"       => FloatType
      case "double"      => DoubleType
      case "string"      => StringType
      case "date"        => DateType
      case "timestamptz" => TimestampType
      case "timestamp"   => TimestampNTZType
      case "binary"      => BinaryType
      case d if d.startsWith("decimal(") =>
        val inner = d.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(inner(0).trim.toInt, inner(1).trim.toInt)
      case other => throw new IllegalArgumentException(
        s"Iceberg table $path uses type '$other' — unsupported by this reader")
    } else t.get("type").asText match {
      case "struct" => structOf(t, path)
      case "list" =>
        ArrayType(sparkType(t.get("element"), path),
          containsNull = !Option(t.get("element-required")).exists(_.asBoolean))
      case "map" =>
        MapType(sparkType(t.get("key"), path), sparkType(t.get("value"), path),
          valueContainsNull = !Option(t.get("value-required")).exists(_.asBoolean))
      case other => throw new IllegalArgumentException(
        s"Iceberg table $path uses nested type '$other' — unsupported by this reader")
    }

  /** Manifest URIs are full URIs per spec; tolerate plain/relative paths
    * from hand-rolled writers by resolving against the table root. Only
    * `file:` URIs are reachable for this local reader. */
  private def resolveUri(root: Path, uri: String): Path = {
    if (uri.startsWith("file:")) Paths.get(java.net.URI.create(uri.replace(" ", "%20")))
    else {
      require(!uri.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*"),
        s"Iceberg metadata references remote storage ($uri) — unsupported by this local reader")
      val p = Paths.get(uri)
      if (p.isAbsolute) p else root.resolve(p)
    }
  }

  private def readAvro(p: Path): Seq[GenericRecord] = {
    require(Files.isRegularFile(p), s"referenced Avro metadata file $p is missing")
    val reader = new DataFileReader[GenericRecord](
      p.toFile, new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toSeq
    finally reader.close()
  }

  private def deleteRecursively(p: Path): Unit = DeltaInterop.deleteRecursively(p)
}
