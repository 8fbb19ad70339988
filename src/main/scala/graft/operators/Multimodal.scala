package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fns.epsRound

/** Multimodal columns (SURVEY.md §2 G — capability-mandated extension):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * Every decode step here is REAL and dependency-free: RIFF/WAVE header +
  * 16-bit PCM sample decode ([[WavCodec]]), 24-bit BMP header decode
  * ([[BmpCodec]]), and container-agnostic byte-signal features
  * ([[ByteFeatures]] — mean, Shannon entropy, windowed energy profile).
  * A proprietary-format codec (JPEG/MP4) would slot into the same
  * `mapPartitions` body — that per-partition boundary is exactly where a
  * JNI/py-arrow decoder sits (the Scala analogue of a Pandas
  * `mapInPandas` batch UDF).
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
      energy_profile: Array[Float])
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

  /** The decode operators' null contract, made LOUD: the media schema
    * declares `content` nullable and [[extractFeatures]] treats null as
    * empty bytes, but a codec cannot decode absent bytes — a null row
    * reaching a decoder is an upstream filtering bug, reported with the
    * offending media_id instead of a bare NullPointerException. */
  private def requireContent(id: Long, bytes: Array[Byte]): Unit =
    require(bytes != null,
      s"null content for media_id=$id — filter null rows before decoding " +
        "(ByteFeatures/extractFeatures accept them; codecs cannot)")

  /** Content-signature-keyed fixture directory + idempotency marker.
    * Keyed by CONTENT (order-independent xor of row hashes), not just the
    * source path — regenerated source data must not serve stale fixture
    * bytes from a previous corpus at the same location. */
  private def fixtureDir(docs: DataFrame, idCol: String, textCol: String,
      prefix: String, fixtureKey: String, modulo: Int): java.nio.file.Path = {
    val sig = docs
      .agg(bit_xor(xxhash64(col(idCol), col(textCol))), count(lit(1)))
      .collect().head.toSeq.mkString("_")
    // modulo is part of the identity: the sampling parameter changes WHICH
    // files exist, so a fixture written at modulo=10 must never satisfy a
    // modulo=5 request via the shared _SUCCESS marker
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${java.lang.Integer.toHexString((fixtureKey + sig + "%" + modulo).hashCode)}")
  }

  /** Write a deterministic on-disk media fixture (one `doc_<id>.bin` per
    * sampled document, bytes = UTF-8 text) and return its directory — the
    * ingest side of a real `spark.read.format("binaryFile")` pipeline.
    * Idempotent via a _SUCCESS marker. Files are written by the EXECUTORS
    * (foreachPartition — each task writes its own shard, the driver only
    * publishes the marker), which is the actual shape of materializing a
    * media corpus at scale; on a cluster the target would be shared
    * storage rather than a local tmpdir.
    */
  def writeMediaFixture(docs: DataFrame, idCol: String, textCol: String, fixtureKey: String,
      modulo: Int = 10): String = {
    import java.nio.file.{Files, Paths}
    val out = fixtureDir(docs, idCol, textCol, "graft_media", fixtureKey, modulo)
    val marker = out.resolve("_SUCCESS")
    if (!Files.exists(marker)) {
      Files.createDirectories(out)
      val outStr = out.toString
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol) % modulo === 0)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            Files.write(Paths.get(outStr, s"doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        }
      Files.write(marker, Array.empty[Byte])
    }
    out.toString
  }

  /** Write a deterministic WAV fixture — REAL RIFF/WAVE PCM containers
    * ([[WavCodec.wavBytes]]), one `doc_<id>.wav` per sampled document, with
    * format parameters derived from the id and payload from the text bytes
    * so every header field is independently recomputable by the DuckDB
    * oracle. Executor-side writes, driver-side marker, like
    * [[writeMediaFixture]].
    */
  def writeWavFixture(docs: DataFrame, idCol: String, textCol: String, fixtureKey: String,
      modulo: Int = 10): String = {
    import java.nio.file.{Files, Paths}
    val out = fixtureDir(docs, idCol, textCol, "graft_wav", fixtureKey, modulo)
    val marker = out.resolve("_SUCCESS")
    if (!Files.exists(marker)) {
      Files.createDirectories(out)
      val outStr = out.toString
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol) % modulo === 0)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            val id = r.getLong(0)
            Files.write(Paths.get(outStr, s"doc_${id}.wav"),
              WavCodec.wavBytes(id, r.getString(1).getBytes("UTF-8")))
          }
        }
      Files.write(marker, Array.empty[Byte])
    }
    out.toString
  }

  /** Container-agnostic byte-signal features — every field a real
    * statistic of the payload bytes: mean byte value, Shannon entropy of
    * the byte histogram (the compressibility proxy a crawl pipeline
    * filters on), and an `embDim`-window ENERGY PROFILE (RMS of byte
    * values per equal-width window, normalized to [0,1]) — the temporal
    * shape of the signal, the dependency-free analogue of a coarse
    * spectrogram row. Nothing is faked or hash-derived. */
  object ByteFeatures {
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
        val lo = (d.toLong * n / embDim).toInt
        val hi = ((d + 1).toLong * n / embDim).toInt
        if (hi <= lo) 0f
        else {
          var sq = 0.0
          var j = lo
          while (j < hi) { val v = (bytes(j) & 0xFF).toDouble; sq += v * v; j += 1 }
          (math.sqrt(sq / (hi - lo)) / 255.0).toFloat
        }
      }
      MediaFeatures(id, n.toLong, mean, entropy, emb)
    }
  }

  /** REAL codec for one public container format: RIFF/WAVE PCM
    * (the canonical 44-byte header layout documented in the public
    * RIFF/WAVE spec — multimedia programming interface, IBM/Microsoft
    * 1991). Dependency-free: the writer emits byte-exact headers, the
    * parser walks RIFF chunks (not fixed offsets, so extra chunks parse
    * fine). The decode path for the declared
    * media-features query — every parsed field is real data decoded from
    * real file bytes.
    *
    * Fixture parameter derivation (so a SQL oracle can recompute every
    * field from (doc_id, text) alone):
    *   channels     = 1 + doc_id % 2
    *   sample_rate  = 8000 * (1 + doc_id % 3)
    *   bits         = 16 (block align = channels * 2)
    *   data bytes   = octet_length(text) rounded DOWN to block align
    *   n_frames     = data_bytes / block_align
    *   duration_ms  = n_frames * 1000 / sample_rate (integer division)
    */
  object WavCodec {
    case class WavMeta(
        sample_rate: Int, channels: Int, bits_per_sample: Int,
        data_bytes: Long, n_frames: Long, duration_ms: Long)
    case class WavRow(media_id: Long, sample_rate: Long, channels: Long,
        n_frames: Long, duration_ms: Long, n_bytes: Long)

    private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    /** A complete PCM WAV file for the fixture: deterministic format from
      * the id, samples = the text bytes truncated to whole frames. */
    def wavBytes(id: Long, payload: Array[Byte]): Array[Byte] = {
      val channels = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val bits = 16
      val blockAlign = channels * bits / 8
      val dataLen = (payload.length / blockAlign) * blockAlign
      val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
      bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(36 + dataLen))
      bos.write("WAVE".getBytes("US-ASCII"))
      bos.write("fmt ".getBytes("US-ASCII")); bos.write(le32(16))
      bos.write(le16(1)) // PCM
      bos.write(le16(channels)); bos.write(le32(rate))
      bos.write(le32(rate * blockAlign)) // byte rate
      bos.write(le16(blockAlign)); bos.write(le16(bits))
      bos.write("data".getBytes("US-ASCII")); bos.write(le32(dataLen))
      bos.write(payload, 0, dataLen)
      bos.toByteArray
    }

    case class AudioStatsRow(media_id: Long, n_samples: Long, peak: Long, rms: Double)

    /** The data chunk's 16-bit little-endian PCM samples (signed) — REAL
      * sample decode, not just headers. Same chunk-walk guards as
      * [[parse]]: malformed lengths throw, never hang or misreport. */
    def samples(bytes: Array[Byte]): Array[Int] = {
      def u32(o: Int): Long =
        (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
      def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
      var off = 12
      var fmtOk = false
      while (off + 8 <= bytes.length) {
        val id = tag(off); val len = u32(off + 4)
        val advance = 8 + len.toInt + (len.toInt & 1)
        require(advance > 0 && off + 8 + len <= bytes.length,
          s"malformed chunk length $len at offset $off (${bytes.length} bytes)")
        if (id == "fmt ") {
          // this decoder pairs bytes as signed 16-bit PCM — an 8- or
          // 24-bit (or compressed) file would decode to GARBAGE sample
          // values with no error, so anything but format=1/bits=16 throws
          require(len >= 16, s"malformed fmt chunk length $len at offset $off")
          val audioFormat = u16(off + 8); val bits = u16(off + 22)
          require(audioFormat == 1 && bits == 16,
            s"unsupported WAV encoding (format=$audioFormat, bits=$bits); only 16-bit PCM decodes")
          fmtOk = true
        }
        if (id == "data") {
          require(fmtOk, "data chunk precedes fmt; cannot validate the sample encoding")
          val start = off + 8
          val n = (len / 2).toInt
          return Array.tabulate(n) { i =>
            val lo = bytes(start + 2 * i) & 0xFF
            val hi = bytes(start + 2 * i + 1).toInt // sign-extends
            (hi << 8) | lo
          }
        }
        off += advance
      }
      throw new IllegalArgumentException("missing data chunk")
    }

    /** Chunk-walking header parse; throws on non-WAV bytes. */
    def parse(bytes: Array[Byte]): WavMeta = {
      def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def u32(o: Int): Long =
        (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
      var off = 12
      var rate = 0; var channels = 0; var bits = 0; var dataLen = -1L
      while (off + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
        val id = tag(off); val len = u32(off + 4)
        id match {
          case "fmt " =>
            // bounds BEFORE field reads: an undersized fmt chunk (len<16)
            // would otherwise read the NEXT chunk's header bytes as
            // channels/rate/bits and misreport with no error
            require(len >= 16 && off + 8 + 16 <= bytes.length,
              s"malformed fmt chunk length $len at offset $off")
            channels = u16(off + 10); rate = u32(off + 12).toInt; bits = u16(off + 22)
          case "data" => dataLen = len
          case _ => ()
        }
        val advance = 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
        // a corrupt u32 length can make the advance zero or negative
        // (len.toInt wraps) — that would spin this executor task forever —
        // and a truncated file can declare a chunk longer than the bytes
        // that remain, silently inflating data_bytes/frames/duration.
        // Malformed input must throw, never hang or misreport.
        require(advance > 0 && off + 8 + len <= bytes.length,
          s"malformed chunk length $len at offset $off (${bytes.length} bytes)")
        off += advance
      }
      require(rate > 0 && dataLen >= 0, "missing fmt/data chunk")
      val blockAlign = channels * bits / 8
      val frames = if (blockAlign == 0) 0L else dataLen / blockAlign
      WavMeta(rate, channels, bits, dataLen, frames, frames * 1000L / rate)
    }
  }

  /** REAL codec for a second public container: Windows BMP with the
    * 40-byte BITMAPINFOHEADER (public BMP file format, documented since
    * Windows 3.0) — 24-bit uncompressed pixels, rows padded to 4-byte
    * boundaries. Same contract as [[WavCodec]]: byte-exact writer,
    * header-walking parser, dependency-free, every parsed field
    * recomputable by the SQL oracle from (doc_id, text) alone.
    *
    * Fixture parameter derivation:
    *   width      = 4 + doc_id % 13            (pixels)
    *   row_stride = ((width*3 + 3) div 4) * 4  (bytes, padded)
    *   height     = max(1, min(octet_length(text) div row_stride, 8))
    *   img_bytes  = row_stride * height
    *   file_bytes = 54 + img_bytes
    * Pixels = text bytes truncated to img_bytes (zero-padded when short).
    */
  object BmpCodec {
    case class BmpMeta(width: Int, height: Int, bits_per_pixel: Int,
        img_bytes: Long, file_bytes: Long)
    case class BmpRow(media_id: Long, width: Long, height: Long,
        n_pixels: Long, img_bytes: Long, file_bytes: Long)

    private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    def dims(id: Long, payloadLen: Int): (Int, Int, Int) = {
      val width = 4 + (id % 13).toInt
      val stride = ((width * 3 + 3) / 4) * 4
      val height = math.max(1, math.min(payloadLen / stride, 8))
      (width, height, stride)
    }

    /** Row stride in bytes for a 24-bit image of the given width (rows pad
      * to 4-byte boundaries per the format). */
    def strideOf(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** General writer: wrap already-strided 24-bit pixel data (length must
      * be `strideOf(width) * height`) in a BITMAPINFOHEADER container. */
    def encode(width: Int, height: Int, pixelData: Array[Byte]): Array[Byte] = {
      val imgLen = strideOf(width) * height
      require(pixelData.length == imgLen,
        s"pixel data is ${pixelData.length} bytes; ${width}x$height needs $imgLen")
      val fileLen = 54 + imgLen
      val bos = new java.io.ByteArrayOutputStream(fileLen)
      bos.write('B'); bos.write('M')
      bos.write(le32(fileLen)); bos.write(le32(0)); bos.write(le32(54)) // pixel offset
      bos.write(le32(40)) // BITMAPINFOHEADER
      bos.write(le32(width)); bos.write(le32(height))
      bos.write(le16(1)); bos.write(le16(24)) // planes, bpp
      bos.write(le32(0)); bos.write(le32(imgLen)) // BI_RGB, image size
      bos.write(le32(2835)); bos.write(le32(2835)); bos.write(le32(0)); bos.write(le32(0))
      bos.write(pixelData, 0, imgLen)
      bos.toByteArray
    }

    def bmpBytes(id: Long, payload: Array[Byte]): Array[Byte] = {
      val (width, height, stride) = dims(id, payload.length)
      encode(width, height, java.util.Arrays.copyOf(payload, stride * height))
    }

    /** Header parse; throws on non-BMP bytes or size lies (a declared
      * image size past the end of the file must error, not misreport). */
    def parse(bytes: Array[Byte]): BmpMeta = {
      def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def u32(o: Int): Long =
        (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
      val fileLen = u32(2)
      val pixelOffset = u32(10)
      val hdrSize = u32(14)
      require(hdrSize == 40, s"unsupported DIB header size $hdrSize")
      val width = u32(18).toInt; val height = u32(22).toInt
      val bpp = u16(28); val compression = u32(30); val imgLenDecl = u32(34)
      // downstream pixel math assumes the 54-byte header layout and 24-bit
      // rows (resizeBmpHalf indexes bytes(54 + y*stride24 + x*3)); a legal
      // 8-bpp file or a palette gap would read garbage or out of bounds
      // with no error — anything but this exact supported shape throws
      require(compression == 0, s"unsupported compression $compression")
      require(bpp == 24, s"unsupported bits-per-pixel $bpp; only 24-bit decodes")
      require(pixelOffset == 54, s"unsupported pixel-data offset $pixelOffset (palette/gap?)")
      require(width > 0 && height > 0, s"non-positive dimensions ${width}x$height")
      // BI_RGB permits a declared image size of 0; anything else must
      // equal the grid the dimensions imply, or the pixel walk misindexes
      val expected = strideOf(width).toLong * height
      val imgLen = if (imgLenDecl == 0L) expected else imgLenDecl
      require(imgLen == expected,
        s"declared image size $imgLenDecl != ${width}x$height stride grid $expected")
      require(54 + imgLen <= bytes.length && fileLen <= bytes.length,
        s"declared sizes exceed the file (${bytes.length} bytes)")
      BmpMeta(width, height, bpp, imgLen, fileLen)
    }
  }

  /** Write a deterministic BMP fixture — real 24-bit BITMAPINFOHEADER
    * containers, one `doc_<id>.bmp` per sampled document; executor-side
    * writes, driver-side marker, like [[writeWavFixture]]. */
  def writeBmpFixture(docs: DataFrame, idCol: String, textCol: String, fixtureKey: String,
      modulo: Int = 10): String = {
    import java.nio.file.{Files, Paths}
    val out = fixtureDir(docs, idCol, textCol, "graft_bmp", fixtureKey, modulo)
    val marker = out.resolve("_SUCCESS")
    if (!Files.exists(marker)) {
      Files.createDirectories(out)
      val outStr = out.toString
      docs.select(col(idCol).cast("long"), col(textCol))
        .where(col(idCol) % modulo === 0)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            val id = r.getLong(0)
            Files.write(Paths.get(outStr, s"doc_${id}.bmp"),
              BmpCodec.bmpBytes(id, r.getString(1).getBytes("UTF-8")))
          }
        }
      Files.write(marker, Array.empty[Byte])
    }
    out.toString
  }

  /** Distributed BMP decode — the image analogue of [[decodeWav]]; fields
    * come from the file's real headers, per-partition, shuffle-free. */
  def decodeBmp(media: DataFrame): Dataset[BmpCodec.BmpRow] = {
    implicit val enc = Encoders.product[BmpCodec.BmpRow]
    media.select("media_id", "content").as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          requireContent(id, bytes)
          val m = BmpCodec.parse(bytes)
          BmpCodec.BmpRow(id, m.width.toLong, m.height.toLong,
            m.width.toLong * m.height, m.img_bytes, m.file_bytes)
        }
      }
  }

  /** Nearest-neighbor half-size resize, per partition where the bytes
    * live: parse the container, sample input pixel (2x, 2y) for every
    * output pixel (x, y) on the STORED row grid, re-encode a valid BMP
    * with the new dimensions. `out_dim = (in_dim + 1) div 2` (ceiling
    * halving), so a 1-pixel axis stays 1 pixel. The decode → transform →
    * re-encode shape is the whole image-preprocessing tier of a
    * multimodal pipeline (resize before feature extraction); at 100 TB it
    * is map-only — no shuffle, bytes never leave the partition that read
    * them. Expects (media_id, content); returns the same shape with
    * half-size containers. */
  def resizeBmpHalf(media: DataFrame): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select("media_id", "content").as(enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          requireContent(id, bytes)
          val m = BmpCodec.parse(bytes)
          val stride = BmpCodec.strideOf(m.width)
          val (ow, oh) = ((m.width + 1) / 2, (m.height + 1) / 2)
          val ostride = BmpCodec.strideOf(ow)
          val out = new Array[Byte](ostride * oh) // inter-row padding stays 0
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              var c = 0
              while (c < 3) {
                out(y * ostride + x * 3 + c) = bytes(54 + 2 * y * stride + 2 * x * 3 + c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          id -> BmpCodec.encode(ow, oh, out)
        }
      }.toDF("media_id", "content")
  }

  /** Distributed WAV decode: binaryFile rows -> parsed audio metadata, the
    * codec running per-partition where the bytes live (the same boundary a
    * JNI decoder would occupy; this one is REAL — fields come from the
    * file's RIFF header, no stub). Expects (media_id, content). */
  def decodeWav(media: DataFrame): Dataset[WavCodec.WavRow] = {
    implicit val enc = Encoders.product[WavCodec.WavRow]
    media.select("media_id", "content").as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          requireContent(id, bytes)
          val m = WavCodec.parse(bytes)
          WavCodec.WavRow(id, m.sample_rate.toLong, m.channels.toLong,
            m.n_frames, m.duration_ms, bytes.length.toLong)
        }
      }
  }

  /** Distributed PCM SAMPLE decode + signal statistics (peak amplitude,
    * RMS): the audio analogue of pixel-level image features, computed from
    * the actual 16-bit samples where the bytes live — no shuffle touches
    * the payload. Sums of squares stay exact in doubles (integer values,
    * totals far below 2^53), so RMS is bit-reproducible by the oracle.
    */
  def decodeWavStats(media: DataFrame): Dataset[WavCodec.AudioStatsRow] = {
    implicit val enc = Encoders.product[WavCodec.AudioStatsRow]
    media.select("media_id", "content").as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          requireContent(id, bytes)
          val ss = WavCodec.samples(bytes)
          var peak = 0L
          var sq = 0.0
          var i = 0
          while (i < ss.length) {
            val v = ss(i).toLong
            val a = math.abs(v)
            if (a > peak) peak = a
            sq += (v * v).toDouble
            i += 1
          }
          val rms = if (ss.isEmpty) 0.0 else math.sqrt(sq / ss.length)
          WavCodec.AudioStatsRow(id, ss.length.toLong, peak, rms)
        }
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
      .mapPartitions { it => it.map { case (id, bytes) => ByteFeatures.features(id, bytes, embDim) } }
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

  /** One sampled frame's scalar feature (unsigned byte sum — a real
    * decoder swaps in a pixel histogram; the pipeline shape is what's
    * under test). */
  case class FrameIntensity(media_id: Long, frame_idx: Int, intensity: Long)

  /** Scene-cut detection over sampled frames: per media, consecutive
    * frames' intensities are compared and a cut is flagged where the jump
    * exceeds `cutThreshold` — the decode → per-frame feature → temporal
    * segmentation pipeline every video corpus build runs (shot boundaries
    * gate frame dedup and caption alignment). Frame features are computed
    * where the bytes live (mapPartitions, payload never shuffles); only the
    * (media, frame, scalar) rows — thousands of times smaller — reach the
    * window, which partitions by media (no global sort). */
  def sceneCuts(
      media: DataFrame,
      strideMs: Long = 10000L,
      maxFrames: Int = 8,
      cutThreshold: Long = 200L): DataFrame = {
    implicit val enc = Encoders.product[FrameIntensity]
    val intens = sampleFrames(media, strideMs, maxFrames)
      .select("media_id", "frame_idx", "frame_bytes")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY))
      .mapPartitions(_.map { case (id, idx, fb) =>
        val b = if (fb == null) Array.empty[Byte] else fb
        var s = 0L
        var i = 0
        while (i < b.length) { s += b(i) & 0xff; i += 1 }
        FrameIntensity(id, idx, s)
      }).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    intens
      .withColumn("delta", col("intensity") - lag("intensity", 1).over(w))
      .withColumn("is_cut", coalesce(abs(col("delta")) > cutThreshold, lit(false)))
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
