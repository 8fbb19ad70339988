package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg table spec's 32-bit hash and bucket transform
  * (iceberg.apache.org/spec, Appendix B "32-bit Hash Requirements"):
  * standard murmur3_x86_32 with seed 0 over the spec's byte form of each
  * type — int/long/date/timestamp as the 8-byte LITTLE-ENDIAN int64
  * (dates hash their epoch-day ordinal, timestamps their MICROSECONDS
  * since epoch), strings as their raw UTF-8 bytes. `bucket[N](v)` is then
  * `(hash & Int.MaxValue) % N`.
  *
  * Spark's own `Murmur3Hash` expression matches the spec for int64 inputs
  * (same block algorithm, and 8 bytes have no tail) but DIVERGES on
  * strings: its tail handling mixes remaining bytes one at a time instead
  * of the reference switch-fallthrough, so any UTF-8 length not divisible
  * by 4 buckets differently. This object is the reference algorithm
  * (Appleby's public-domain MurmurHash3.cpp), pinned to the spec's own
  * published vectors in BucketTransformSpec / IcebergTransformsSpec:
  * int64 34 → 2017239379, string "iceberg" → 1210000089.
  *
  * Methods are plain static-forwarded functions so [[IcebergBucket]]'s
  * generated code calls them directly (the BpeExpressions pattern).
  */
object IcebergTransforms {

  /** Standard murmur3_x86_32 over `bytes` with `seed`. */
  def murmur3(bytes: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h = seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val i4 = i << 2
      var k = (bytes(i4) & 0xff) | ((bytes(i4 + 1) & 0xff) << 8) |
        ((bytes(i4 + 2) & 0xff) << 16) | ((bytes(i4 + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    // tail — the reference switch-fallthrough (this is where Spark's
    // string variant diverges from the standard)
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (bytes(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (bytes(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= bytes(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h ^= k1
    }
    // finalization mix
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec hash of an int64 value: murmur3 of its 8 little-endian bytes
    * (ints, dates-as-epoch-days and timestamps-as-micros promote here). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b, 0)
  }

  /** Spec hash of a string: murmur3 of its raw UTF-8 bytes. */
  def hashUtf8(s: UTF8String): Int = murmur3(s.getBytes, 0)

  private def requireN(n: Int): Int = {
    if (n < 1) throw new IllegalArgumentException(
      s"iceberg_bucket: the bucket count must be >= 1, got $n")
    n
  }

  /** `bucket[n]` of an int64-hashing value (int/long/date/timestamp). */
  def bucketOfLong(n: Int, v: Long): Int =
    (hashLong(v) & Int.MaxValue) % requireN(n)

  /** `bucket[n]` of a string value (murmur3 over its UTF-8 bytes). */
  def bucketOfUtf8(n: Int, v: UTF8String): Int =
    (hashUtf8(v) & Int.MaxValue) % requireN(n)

  /** Column API over [[IcebergBucket]] — the writer-side form
    * [[graft.sources.IcebergInterop.exportIcebergBucketed]] routes
    * through. */
  def bucket(n: Int, v: Column): Column =
    Bridge.column(IcebergBucket(
      org.apache.spark.sql.catalyst.expressions.Literal(n),
      Bridge.expression(v)))
}

/** `iceberg_bucket(n, v)` — the spec's bucket transform as a dedicated
  * codegen'd expression. Input types are ENFORCED at analysis (round-9
  * advice: the old composed form silently cast strings to null-longs and
  * timestamps to seconds): `n` must be int, `v` must be int, long, date,
  * timestamp, or string — anything else fails the query's analysis
  * instead of hashing a spec-divergent byte form. A null `v` (or `n`)
  * returns null (transforms map null to null per spec); `n < 1` throws at
  * runtime, mirroring the writer's `nBuckets >= 1` require. */
case class IcebergBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "iceberg_bucket"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case IntegerType => right.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket(n, v) buckets int/long/date/timestamp/string values " +
          s"only, got $other — the Iceberg spec's byte form for other types " +
          "is not implemented, and hashing a cast would silently mis-bucket")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket(n, v) takes an int bucket count, got $other")
  }

  override def nullSafeEval(n: Any, v: Any): Any = right.dataType match {
    case StringType => IcebergTransforms.bucketOfUtf8(
      n.asInstanceOf[Int], v.asInstanceOf[UTF8String])
    case IntegerType | DateType => IcebergTransforms.bucketOfLong(
      n.asInstanceOf[Int], v.asInstanceOf[Int].toLong)
    case _ => IcebergTransforms.bucketOfLong(
      n.asInstanceOf[Int], v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, v) => right.dataType match {
      case StringType =>
        s"graft.functions.IcebergTransforms.bucketOfUtf8($n, $v)"
      case IntegerType | DateType =>
        s"graft.functions.IcebergTransforms.bucketOfLong($n, (long) $v)"
      case _ =>
        s"graft.functions.IcebergTransforms.bucketOfLong($n, $v)"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
