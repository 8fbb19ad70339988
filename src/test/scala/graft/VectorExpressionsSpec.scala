package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, VectorExpressions}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(0.0f, 0.0f), Seq(0.0f, 0.0f)),
    (Seq(-1.5f, 2.5f), Seq(3.5f, -0.5f))
  ).toDF("a", "b")

  test("vec_dot matches the HOF fold bit-for-bit") {
    val rows = vecs.select(
      VectorExpressions.vecDot($"a", $"b").as("fast"),
      Fns.dot($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine_sim matches HOF cosine; zero vector -> null") {
    val rows = vecs.select(
      VectorExpressions.cosineSim($"a", $"b").as("fast"),
      Fns.cosine($"a", $"b").as("hof")).collect()
    assert(rows(0).getDouble(0) == rows(0).getDouble(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // zero norm -> null in both
    assert(rows(2).getDouble(0) == rows(2).getDouble(1))
  }

  test("expressions survive codegen (wholestage) and interpreted paths") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r = vecs.select(VectorExpressions.cosineSim($"a", $"b")).collect()
      assert(!r(0).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("SQL surface via GraftExtensions function builders") {
    VectorExpressions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val r = spark.sql("SELECT cosine_sim(array(1.0f,0.0f), array(1.0f,0.0f)) c, vec_dot(array(2.0f,3.0f), array(4.0f,5.0f)) d")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 23.0)
    // iceberg_bucket: the spec's own published vector (murmur3 seed 0 of
    // int64 34 little-endian = 2017239379; bucket 16 → 3), null → null,
    // and agreement with the exporter's hash for int-typed values
    val b = spark.sql(
      "SELECT iceberg_bucket(16, 34L) a, iceberg_bucket(16, 34) b, " +
        "iceberg_bucket(16, CAST(NULL AS BIGINT)) n").collect().head
    assert(b.getInt(0) == (2017239379 & Int.MaxValue) % 16)
    assert(b.getInt(1) == b.getInt(0), "int values must hash as int64 per the spec")
    assert(b.isNullAt(2), "a null key has no bucket")
  }
}
