package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path}

import org.roaringbitmap.RoaringBitmap

/** The Delta protocol's DELETION VECTOR plumbing (delta.io PROTOCOL.md,
  * "Deletion Vectors"): RFC-1924 Base85 (the descriptor's UUID / inline
  * codec), the 64-bit RoaringBitmapArray "portable" serialization
  * (magic 1681511377, little-endian header, one standard-format 32-bit
  * RoaringBitmap per high-32-bit key — the bitmaps themselves ride
  * RoaringBitmap's own spec'd portable format via the org.roaringbitmap
  * library Spark already ships), and the on-disk DV file layout
  * (1-byte format version, then per DV: 4-byte big-endian size, the
  * blob, 4-byte big-endian CRC-32 of the blob).
  *
  * Everything here is driver/executor-neutral plain functions: the read
  * path loads blob BYTES on the driver (compressed-bitmap metadata
  * scale, O(deleted)/compression per file) and expands positions on
  * EXECUTORS ([[DeltaInterop]]'s flatMap), so delete positions never
  * pass through the driver in either direction.
  */
object DeletionVectors {

  // ------------------------------------------------ RFC 1924 Base85
  // (the IPv6 alphabet; Delta encodes DV UUIDs as 20 chars = 16 bytes
  // and inline DVs as whole blobs, 4 big-endian bytes per 5 digits)

  private val Alphabet: Array[Char] =
    ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  require(Alphabet.length == 85)

  private val Reverse: Array[Int] = {
    val r = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => r(c) = i }
    r
  }

  /** Base85-encode `bytes` (zero-padded up to a 4-byte multiple, the
    * Delta codec's convention — the decoder truncates back by the
    * caller-known output length). */
  def base85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val out = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xffL) << 24) | ((padded(i + 1) & 0xffL) << 16) |
        ((padded(i + 2) & 0xffL) << 8) | (padded(i + 3) & 0xffL)
      val digits = new Array[Char](5)
      var j = 4
      while (j >= 0) { digits(j) = Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      out.appendAll(digits)
      i += 4
    }
    out.toString
  }

  /** Decode `s` to its first `outLen` bytes; malformed input is loud. */
  def base85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Base85 input length ${s.length} is not a multiple of 5")
    require(outLen >= 0 && outLen <= s.length / 5 * 4,
      s"Base85 output length $outLen does not fit ${s.length} digits")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Reverse(c) else -1
        require(d >= 0, s"invalid Base85 character '$c' in deletion-vector descriptor")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xffffffffL, "Base85 group overflows 32 bits — corrupt descriptor")
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
      o += 4
    }
    if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen)
  }

  def encodeUuid(u: java.util.UUID): String = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    base85Encode(b.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    require(s.length == 20, s"a Base85 UUID is 20 characters, got ${s.length}")
    val b = java.nio.ByteBuffer.wrap(base85Decode(s, 16))
    new java.util.UUID(b.getLong(), b.getLong())
  }

  // ------------------------------- RoaringBitmapArray (portable format)

  /** The protocol's magic number heading every serialized DV blob. */
  val Magic = 1681511377

  /** Serialize 64-bit positions as the portable RoaringBitmapArray:
    * magic + 8-byte LE bitmap count + per key (4-byte LE) one standard
    * 32-bit RoaringBitmap. Keys ascend; value = (key << 32) | low32. */
  def serialize(positions: Iterator[Long]): Array[Byte] = {
    val byKey = new java.util.TreeMap[Integer, RoaringBitmap]()
    positions.foreach { p =>
      require(p >= 0L, s"deletion-vector position $p is negative")
      val key = (p >>> 32).toInt
      val low = (p & 0xffffffffL).toInt
      byKey.computeIfAbsent(key, _ => new RoaringBitmap()).add(low)
    }
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(Magic))
    out.writeLong(java.lang.Long.reverseBytes(byKey.size.toLong))
    byKey.forEach { (key, bm) =>
      bm.runOptimize()
      out.writeInt(Integer.reverseBytes(key))
      bm.serialize(out) // the library writes ITS spec'd portable LE format
    }
    out.flush()
    bos.toByteArray
  }

  /** Deserialize a blob back to its (key, 32-bit bitmap) parts. */
  def bitmaps(data: Array[Byte]): Seq[(Int, RoaringBitmap)] = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val magic = Integer.reverseBytes(in.readInt())
    require(magic == Magic,
      s"deletion-vector blob has magic $magic, expected $Magic — corrupt or not a DV")
    val n = java.lang.Long.reverseBytes(in.readLong())
    require(n >= 0L && n <= Int.MaxValue, s"deletion vector declares $n bitmaps")
    (0L until n).map { _ =>
      val key = Integer.reverseBytes(in.readInt())
      val bm = new RoaringBitmap()
      bm.deserialize(in)
      (key, bm)
    }
  }

  /** All 64-bit positions of a blob, ascending — executor-side expansion
    * (one file's deletions at a time; never collected to the driver). */
  def positions(data: Array[Byte]): Iterator[Long] =
    bitmaps(data).iterator.flatMap { case (key, bm) =>
      val hi = key.toLong << 32
      val it = bm.getIntIterator
      new Iterator[Long] {
        def hasNext: Boolean = it.hasNext
        def next(): Long = hi | (it.next().toLong & 0xffffffffL)
      }
    }

  /** Union of two serialized blobs (stacked deletes on one file). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(positions(a) ++ positions(b))

  def cardinality(data: Array[Byte]): Long =
    bitmaps(data).map(_._2.getLongCardinality).sum

  // ------------------------------------------------- DV file layout

  /** Write one DV FILE holding `blobs` in order (each: 4-byte BE size,
    * blob, 4-byte BE CRC-32), named `deletion_vector_<uuid>.bin` in
    * `tableRoot` with a content-derived uuid (deterministic fixtures).
    * @return (pathOrInlineDv for storageType "u", per-blob offset). */
  def writeDvFile(tableRoot: Path, blobs: Seq[Array[Byte]]): (String, Seq[Int]) = {
    val uuid = java.util.UUID.nameUUIDFromBytes(
      blobs.flatten.toArray ++ blobs.length.toString.getBytes("UTF-8"))
    val file = tableRoot.resolve(s"deletion_vector_$uuid.bin")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(1) // DV file format version
    val offsets = blobs.map { blob =>
      val at = bos.size()
      out.writeInt(blob.length)
      out.write(blob)
      val crc = new java.util.zip.CRC32()
      crc.update(blob)
      out.writeInt(crc.getValue.toInt)
      at
    }
    out.flush()
    Files.write(file, bos.toByteArray)
    (encodeUuid(uuid), offsets)
  }

  /** Resolve a descriptor's DV file under `tableRoot`: storageType "u"
    * derives `<prefix>/deletion_vector_<uuid>.bin` from the encoded UUID
    * (the LAST 20 chars; anything before is the writer's random prefix);
    * "p" is a plain path (scheme-qualified URIs refused — external
    * storage this local reader cannot reach). */
  def resolveDvFile(tableRoot: Path, storageType: String,
      pathOrInlineDv: String): Path = storageType match {
    case "u" =>
      require(pathOrInlineDv.length >= 20,
        s"storageType 'u' descriptor '$pathOrInlineDv' is shorter than an encoded UUID")
      val prefix = pathOrInlineDv.dropRight(20)
      val uuid = decodeUuid(pathOrInlineDv.takeRight(20))
      val dir = if (prefix.isEmpty) tableRoot else tableRoot.resolve(prefix)
      dir.resolve(s"deletion_vector_$uuid.bin")
    case "p" =>
      require(!pathOrInlineDv.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*"),
        s"deletion vector references external storage ($pathOrInlineDv) — " +
          "unsupported by this local reader")
      val p = java.nio.file.Paths.get(pathOrInlineDv)
      if (p.isAbsolute) p else tableRoot.resolve(pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"unknown deletion-vector storageType '$other' (expected u, i, or p)")
  }

  /** Read one DV blob out of `file` at `offset`, verifying the format
    * version byte, the declared size, and the CRC-32 — a torn or
    * mis-offset read must fail, not deserialize garbage positions. */
  def readDvBlob(file: Path, offset: Int, sizeInBytes: Int): Array[Byte] = {
    require(Files.isRegularFile(file),
      s"deletion-vector file $file is missing — cannot read the table " +
        "without silently resurrecting deleted rows")
    val all = Files.readAllBytes(file)
    require(all.nonEmpty && all(0) == 1,
      s"deletion-vector file $file has format version ${if (all.isEmpty) "<empty>" else all(0)} — expected 1")
    require(offset >= 1 && offset + 4 + sizeInBytes + 4 <= all.length,
      s"deletion-vector blob at offset $offset (+$sizeInBytes) does not fit $file (${all.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(all, offset, 8 + sizeInBytes)
    val declared = buf.getInt
    require(declared == sizeInBytes,
      s"deletion-vector blob at $file:$offset declares $declared bytes, " +
        s"descriptor says $sizeInBytes — corrupt descriptor or file")
    val blob = java.util.Arrays.copyOfRange(all, offset + 4, offset + 4 + sizeInBytes)
    val crc = new java.util.zip.CRC32()
    crc.update(blob)
    val stored = java.nio.ByteBuffer
      .wrap(all, offset + 4 + sizeInBytes, 4).getInt
    require(crc.getValue.toInt == stored,
      s"deletion-vector blob at $file:$offset fails its CRC-32 — corrupt file")
    blob
  }
}
