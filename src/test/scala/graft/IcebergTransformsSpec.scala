package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{IcebergBucket, IcebergTransforms}

/** The spec's own published 32-bit hash vectors (iceberg.apache.org/spec,
  * Appendix B) pin the reference murmur3 — and the STRING vector is the
  * whole point of the dedicated expression: Spark's Murmur3Hash diverges
  * from the standard on non-4-byte-aligned tails, so "iceberg" (7 UTF-8
  * bytes) is exactly the case the old composed form could not hash. */
class IcebergTransformsSpec extends SparkSpec {

  test("spec vectors: int64 34 -> 2017239379, string 'iceberg' -> 1210000089") {
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    assert(IcebergTransforms.hashUtf8(UTF8String.fromString("iceberg")) == 1210000089)
    // ints hash as int64 per the spec (hashInt(v) == hashLong(v))
    assert(IcebergTransforms.hashLong(34) == IcebergTransforms.hashLong(34L))
  }

  test("bucket = (hash & Int.MaxValue) % n; n < 1 refuses") {
    assert(IcebergTransforms.bucketOfLong(16, 34L) == (2017239379 & Int.MaxValue) % 16)
    assert(IcebergTransforms.bucketOfUtf8(16, UTF8String.fromString("iceberg")) ==
      (1210000089 & Int.MaxValue) % 16)
    val e = intercept[IllegalArgumentException](IcebergTransforms.bucketOfLong(0, 34L))
    assert(e.getMessage.contains(">= 1"))
    intercept[IllegalArgumentException](IcebergTransforms.bucketOfLong(-8, 34L))
  }

  test("expression: string and temporal values, null -> null, codegen == interpreted") {
    import spark.implicits._
    val df = Seq(
      ("iceberg", Option(java.sql.Timestamp.valueOf("2017-11-16 22:31:08")),
        Option(java.sql.Date.valueOf("2017-11-16"))),
      (null, None, None)
    ).toDF("s", "ts", "d")
    def run(): Seq[org.apache.spark.sql.Row] = df.select(
      IcebergTransforms.bucket(16, $"s").as("bs"),
      IcebergTransforms.bucket(16, $"ts").as("bt"),
      IcebergTransforms.bucket(16, $"d").as("bd"),
      unix_micros($"ts").as("micros"),
      datediff($"d", lit(java.sql.Date.valueOf("1970-01-01"))).as("days")
    ).collect().toSeq
    val rows = run()
    val r = rows.head
    assert(r.getInt(0) == (1210000089 & Int.MaxValue) % 16)
    // the spec hashes timestamps as MICROS since epoch and dates as their
    // epoch-day ordinal — both promote through hashLong
    assert(r.getInt(1) == IcebergTransforms.bucketOfLong(16, r.getLong(3)))
    assert(r.getInt(2) == IcebergTransforms.bucketOfLong(16, r.getInt(4).toLong))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == rows)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("analysis refuses unsupported value types and non-int bucket counts") {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    val df = Seq((1.5, 2)).toDF("x", "n")
    val badValue = intercept[Exception] {
      df.select(Bridge.column(IcebergBucket(
        Bridge.expression(lit(16)), Bridge.expression($"x")))).collect()
    }
    assert(badValue.getMessage.toLowerCase.contains("double"))
    val badN = intercept[Exception] {
      df.select(Bridge.column(IcebergBucket(
        Bridge.expression(lit(16L)), Bridge.expression($"n")))).collect()
    }
    assert(badN.getMessage.toLowerCase.contains("bucket count") ||
      badN.getMessage.toLowerCase.contains("bigint"))
  }
}
