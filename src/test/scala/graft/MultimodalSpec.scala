package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world this is a tiny document"),
    (1L, "another document with some more words inside of it"),
    (5L, "short one")
  ).toDF("doc_id", "text")

  test("syntheticMedia produces binary payload + typed metadata struct") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(m.schema("content").dataType.typeName == "binary")
    val r = m.where($"media_id" === 0L).select($"meta.media_type", length($"content")).head()
    assert(r.getString(0) == "image")
    assert(r.getInt(1) == "hello world this is a tiny document".length)
  }

  test("extractFeatures is deterministic and shuffle-free in shape") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.map(_.byte_entropy).toSeq == f2.map(_.byte_entropy).toSeq)
    assert(f1.head.energy_profile.length == 16)
    // the profile is a real statistic: a constant payload's windows all
    // carry the same normalized RMS
    val const = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(Seq((7L, "aaaaaaaaaaaaaaaa")).toDF("doc_id", "text"),
        "doc_id", "text")).collect().head
    assert(const.energy_profile.forall(v => math.abs(v - 97.0 / 255.0) < 1e-6))
    assert(f1.forall(_.n_bytes > 0))
  }

  test("sampleFrames respects duration/stride/cap formula") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val counts = Multimodal.sampleFrames(m).groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: duration 0 -> max(0/10000,1)=1 frame; doc 5: 5000ms -> 1; doc 1: 1000ms -> 1
    assert(counts == Map(0L -> 1L, 1L -> 1L, 5L -> 1L))
    val big = Multimodal.syntheticMedia(Seq((99L, "x" * 100)).toDF("doc_id", "text"), "doc_id", "text")
    // duration 99*1000=99000 -> 9 frames capped at 8
    assert(Multimodal.sampleFrames(big).count() == 8L)
  }

  test("mediaStats groups by media_type") {
    val st = Multimodal.mediaStats(Multimodal.syntheticMedia(docs, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("image" -> 1L, "audio" -> 1L, "video" -> 1L))
  }

  test("WavCodec: writer/parser round-trip matches the derivation formulas") {
    import Multimodal.WavCodec
    for (id <- 0L to 7L; textLen <- Seq(0, 1, 2, 3, 63, 200)) {
      val payload = Array.tabulate(textLen)(i => ((i * 31 + id) & 0xFF).toByte)
      val bytes = WavCodec.wavBytes(id, payload)
      val m = WavCodec.parse(bytes)
      val channels = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val blockAlign = channels * 2
      val dataLen = (textLen / blockAlign) * blockAlign
      assert(m.channels == channels && m.sample_rate == rate && m.bits_per_sample == 16)
      assert(m.data_bytes == dataLen.toLong)
      assert(m.n_frames == dataLen / blockAlign)
      assert(m.duration_ms == m.n_frames * 1000L / rate)
      assert(bytes.length == 44 + dataLen)
    }
  }

  test("WavCodec.parse walks chunks (extra chunk before data) and rejects non-WAV") {
    import Multimodal.WavCodec
    val base = WavCodec.wavBytes(1L, Array.tabulate(64)(_.toByte))
    // splice a LIST chunk of 6 bytes (word-aligned content) between fmt and data
    val insertAt = 36 // end of canonical fmt chunk
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(7)
    val spliced = base.take(insertAt) ++ extra ++ base.drop(insertAt)
    val m = WavCodec.parse(spliced)
    assert(m.sample_rate == 16000 && m.channels == 2 && m.n_frames == 16L)
    intercept[IllegalArgumentException](WavCodec.parse("not a wav at all".getBytes))
  }

  test("writeWavFixture: executor-written files, binaryFile read-back, distributed decode") {
    val wavDir = Multimodal.writeWavFixture(docs, "doc_id", "text", fixtureKey = "spec", modulo = 5)
    val media = spark.read.format("binaryFile").load(wavDir)
      .where($"path".endsWith(".wav"))
      .select(regexp_extract($"path", "doc_(\\d+)\\.wav", 1).cast("long").as("media_id"), $"content")
    val rows = Multimodal.decodeWav(media).collect().sortBy(_.media_id)
    // modulo 5 keeps doc_id 0 and 5
    assert(rows.map(_.media_id).toSeq == Seq(0L, 5L))
    val d0 = rows.head // id 0: 1 channel, 8000 Hz, text is 35 bytes -> 34 data bytes
    assert(d0.channels == 1L && d0.sample_rate == 8000L && d0.n_frames == 17L)
    assert(d0.n_bytes == 44L + 34L)
  }

  test("WavCodec.samples: signed 16-bit LE decode, stats match hand computation") {
    import graft.operators.Multimodal.WavCodec
    // id 0 -> mono, block align 2: every byte pair is one sample
    val payload = Array[Byte](0x01, 0x00, 0x00, 0x01, 0xFF.toByte, 0xFF.toByte, 0x00, 0x80.toByte)
    val got = WavCodec.samples(WavCodec.wavBytes(0L, payload)).toSeq
    assert(got == Seq(1, 256, -1, -32768)) // LE pairs, hi byte sign-extends
    // truncation to whole frames: an odd trailing byte never becomes a sample
    assert(WavCodec.samples(WavCodec.wavBytes(0L, Array[Byte](9, 0, 7))).toSeq == Seq(9))
    // a data chunk length beyond the file must throw, not misdecode
    val ok = WavCodec.wavBytes(0L, payload)
    intercept[IllegalArgumentException](WavCodec.samples(ok.take(ok.length - 3)))
  }

  test("decodeWavStats: peak/rms from real samples through binaryFile read-back") {
    val wavDir = Multimodal.writeWavFixture(docs, "doc_id", "text", fixtureKey = "specaudio", modulo = 5)
    val media = spark.read.format("binaryFile").load(wavDir)
      .where($"path".endsWith(".wav"))
      .select(regexp_extract($"path", "doc_(\\d+)\\.wav", 1).cast("long").as("media_id"), $"content")
    val stats = Multimodal.decodeWavStats(media).collect().map(r => r.media_id -> r).toMap
    val texts = docs.where($"doc_id" % 5 === 0)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val blockAlign = (1 + id % 2).toInt * 2
      val n = (bytes.length / blockAlign) * blockAlign / 2
      val vals = (0 until n).map(i => (bytes(2 * i) & 0xFF) | (bytes(2 * i + 1).toInt << 8))
      val s = stats(id)
      assert(s.n_samples == n.toLong)
      if (n > 0) {
        assert(s.peak == vals.map(v => math.abs(v.toLong)).max)
        assert(math.abs(s.rms - math.sqrt(vals.map(v => v.toDouble * v).sum / n)) < 1e-9)
      }
    }
  }

  test("BmpCodec: writer/parser round-trip matches the derivation; guards reject lies") {
    import Multimodal.BmpCodec
    for (id <- Seq(0L, 3L, 12L, 25L); payloadLen <- Seq(0, 10, 100, 500)) {
      val payload = Array.tabulate(payloadLen)(i => ((i * 7) % 251).toByte)
      val bytes = BmpCodec.bmpBytes(id, payload)
      val m = BmpCodec.parse(bytes)
      val (w, h, stride) = BmpCodec.dims(id, payloadLen)
      assert(m.width == w && m.height == h && m.bits_per_pixel == 24)
      assert(m.img_bytes == stride.toLong * h)
      assert(m.file_bytes == 54L + m.img_bytes && bytes.length.toLong == m.file_bytes)
    }
    intercept[IllegalArgumentException](BmpCodec.parse("definitely not a bitmap".getBytes))
    // a header that declares more pixel bytes than the file holds must throw
    val ok = BmpCodec.bmpBytes(1L, Array.fill[Byte](200)(1))
    val truncated = ok.take(ok.length - 10)
    intercept[IllegalArgumentException](BmpCodec.parse(truncated))
  }

  test("writeBmpFixture: binaryFile read-back and distributed image decode") {
    val bmpDir = Multimodal.writeBmpFixture(docs, "doc_id", "text", fixtureKey = "spec", modulo = 5)
    val media = spark.read.format("binaryFile").load(bmpDir)
      .where($"path".endsWith(".bmp"))
      .select(regexp_extract($"path", "doc_(\\d+)\\.bmp", 1).cast("long").as("media_id"), $"content")
    val rows = Multimodal.decodeBmp(media).collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(0L, 5L))
    val d0 = rows.head // id 0: width 4, stride 12, text 35 bytes -> height 2
    assert(d0.width == 4L && d0.height == 2L && d0.n_pixels == 8L)
    assert(d0.img_bytes == 24L && d0.file_bytes == 54L + 24L)
  }

  test("resizeBmpHalf: output pixel (x,y) is input pixel (2x,2y); dims are ceiling halves") {
    import Multimodal.BmpCodec
    // 5x3 image with pixel value = y*16 + x per channel (distinct, position-coded)
    val (w, h) = (5, 3)
    val stride = BmpCodec.strideOf(w)
    val px = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px(y * stride + x * 3 + c) = (y * 16 + x + c).toByte
    val media = Seq((1L, BmpCodec.encode(w, h, px))).toDF("media_id", "content")
    val out = Multimodal.resizeBmpHalf(media).collect()
    assert(out.length == 1)
    val bytes = out.head.getAs[Array[Byte]]("content")
    val m = BmpCodec.parse(bytes)
    assert(m.width == 3 && m.height == 2, "ceil(5/2) x ceil(3/2)")
    val ostride = BmpCodec.strideOf(3)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      assert(bytes(54 + y * ostride + x * 3 + c) == (2 * y * 16 + 2 * x + c).toByte,
        s"output ($x,$y,$c) must sample input (${2 * x},${2 * y},$c)")
    // 1x1 stays 1x1 and keeps its pixel
    val one = BmpCodec.encode(1, 1, Array[Byte](9, 8, 7, 0)) // stride 4: 3 px + 1 pad
    val r1 = Multimodal.resizeBmpHalf(Seq((2L, one)).toDF("media_id", "content")).collect()
    val m1 = BmpCodec.parse(r1.head.getAs[Array[Byte]]("content"))
    assert(m1.width == 1 && m1.height == 1)
    assert(r1.head.getAs[Array[Byte]]("content").slice(54, 57).toSeq == Seq[Byte](9, 8, 7))
  }
}
