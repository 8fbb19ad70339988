package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fns.epsRound

/** Multimodal columns (SURVEY.md §2 G — capability-mandated extension):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * Spark-side plumbing (schema, partitioning, batch shape) is real; the
  * actual codec step is STUBBED behind [[FakeCodec]] — this container has no
  * image/audio libraries, so decode is a deterministic fake that derives
  * pseudo-features from the bytes. Swapping in a real codec changes ONE
  * function (the `mapPartitions` body), nothing else: that per-partition
  * boundary is exactly where a JNI/py-arrow decoder would sit (the Scala
  * analogue of a Pandas `mapInPandas` batch UDF).
  */
object Multimodal {

  /** Typed media metadata — the analogue of a parquet struct column next to
    * the binary payload. */
  case class MediaMeta(media_type: String, width: Int, height: Int, duration_ms: Long, codec: String)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      byte_mean: Double,
      byte_entropy: Double,
      pseudo_embedding: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, frame_bytes: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType)
    )))
  ))

  /** Build a deterministic synthetic media table from any (id, text) frame —
    * stands in for `spark.read.format("binaryFile")` until real assets
    * exist. Payload = utf8 bytes; metadata derived from the id.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio").otherwise("video").as("media_type"),
        (col(idCol) % 8 * 160 + 320).cast("int").as("width"),
        (col(idCol) % 8 * 90 + 180).cast("int").as("height"),
        (col(idCol) % 100 * 1000).cast("long").as("duration_ms"),
        lit("fake/v1").as("codec")
      ).as("meta")
    )

  /** Write a deterministic on-disk media fixture (one `doc_<id>.bin` per
    * sampled document, bytes = UTF-8 text) and return its directory — the
    * ingest side of a real `spark.read.format("binaryFile")` pipeline.
    * Idempotent via a _SUCCESS marker, keyed by the source dir, so verify
    * and bench runs reuse the files. The codec stays [[FakeCodec]]; what
    * this makes real is the SOURCE: files on disk, read distributed by the
    * binaryFile reader with (path, content, length) columns, ids recovered
    * from paths — the exact shape of a 100 TB object-store media crawl,
    * where each task reads its own shard of files.
    */
  def writeMediaFixture(docs: DataFrame, idCol: String, textCol: String, fixtureKey: String,
      modulo: Int = 10): String = {
    import java.nio.file.{Files, Paths}
    // key the fixture by CONTENT (order-independent xor of row hashes), not
    // just the source path — regenerated source data must not serve stale
    // fixture bytes from a previous corpus at the same location
    val sig = docs
      .agg(bit_xor(xxhash64(col(idCol), col(textCol))), count(lit(1)))
      .collect().head.toSeq.mkString("_")
    val out = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_media_${java.lang.Integer.toHexString((fixtureKey + sig).hashCode)}")
    val marker = out.resolve("_SUCCESS")
    if (!Files.exists(marker)) {
      Files.createDirectories(out)
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol) % modulo === 0)
        .collect()
        .foreach { r =>
          Files.write(out.resolve(s"doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
      Files.write(marker, Array.empty[Byte])
    }
    out.toString
  }

  /** STUB codec — deterministic pseudo-decode. A real implementation would
    * call an image/audio library here (???); everything around it is the
    * production shape: per-partition batching, no driver collect, typed
    * output encoder.
    */
  object FakeCodec {
    def features(id: Long, bytes: Array[Byte], embDim: Int): MediaFeatures = {
      val n = if (bytes == null) 0 else bytes.length
      val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xFF).toDouble).sum / n
      val hist = new Array[Long](256)
      var i = 0
      while (i < n) { hist(bytes(i) & 0xFF) += 1; i += 1 }
      val entropy = hist.filter(_ > 0).map { c =>
        val p = c.toDouble / math.max(n, 1); -p * math.log(p) / math.log(2)
      }.sum
      val emb = Array.tabulate(embDim) { d =>
        var h = id * 1000003L + d * 10007L
        var j = 0
        while (j < n) { h = h * 31 + (bytes(j) & 0xFF); j += 16 }
        (((h % 2000003L).toDouble / 2000003.0) * 2.0 - 1.0).toFloat
      }
      MediaFeatures(id, n.toLong, mean, entropy, emb)
    }
  }

  /** Decode + feature-extract over partition-sized batches. The binary
    * column never passes through a shuffle; features are computed where the
    * bytes already live (scan locality — at 100 TB the payload dominates,
    * so this stage must be shuffle-free, and is).
    */
  def extractFeatures(media: DataFrame, embDim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "content").as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it => it.map { case (id, bytes) => FakeCodec.features(id, bytes, embDim) } }
  }

  /** Frame sampling: emit every `strideMs` offset as a pseudo-frame (slice
    * of the payload). Real video decode swaps the slice for a codec call;
    * the explode shape (one row in, N frame rows out, no shuffle) stays.
    */
  def sampleFrames(media: DataFrame, strideMs: Long = 10000L, maxFrames: Int = 8): DataFrame = {
    val nFrames = least(
      greatest((col("meta.duration_ms") / strideMs).cast("int"), lit(1)), lit(maxFrames))
    media
      .select(col("media_id"), col("content"), col("meta.duration_ms").as("dur"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "__f")))
      .select(
        col("media_id"),
        col("frame_idx"),
        (col("frame_idx") * strideMs).as("offset_ms"),
        // STUB: a real decoder yields pixels; we slice bytes deterministically
        col("content").substr((col("frame_idx") * 8 + 1).cast("int"), lit(8)).as("frame_bytes"))
  }

  /** Aggregate media stats per media_type — the typical QA rollup before
    * training. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("meta.media_type").as("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("content"))).cast("long").as("total_bytes"),
        epsRound(avg(col("meta.width") * col("meta.height")), 2).as("avg_pixels"),
        epsRound(avg(col("meta.duration_ms")), 2).as("avg_duration_ms"))
}
