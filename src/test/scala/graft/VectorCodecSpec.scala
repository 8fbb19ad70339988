package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorCodec, VectorExpressions}

/** Pins the vector-type adapter boundary (VectorCodec): embeddings
  * round-trip bit-exactly through the table-edge binary wire form, the
  * bytes are the documented little-endian float32 layout (so faiss/numpy
  * can read them), and the ANN family's math is unchanged through the
  * boundary.
  */
class VectorCodecSpec extends SparkSpec {
  import spark.implicits._

  test("pack/unpack round-trips bit-exactly, including NaN and signed zero") {
    val vecs = Seq(
      (1L, Array(1.0f, -2.5f, 3.25f)),
      (2L, Array(Float.NaN, Float.NegativeInfinity, -0.0f, Float.MinPositiveValue)),
      (3L, Array.empty[Float])).toDF("id", "vec")
    val back = vecs.select(col("id"), col("vec"),
        VectorCodec.unpack(VectorCodec.pack(col("vec"))).as("rt"))
      .orderBy("id").collect()
    back.foreach { r =>
      val orig = r.getSeq[Float](1)
      val rt = r.getSeq[Float](2)
      assert(orig.length == rt.length)
      orig.zip(rt).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a) == java.lang.Float.floatToRawIntBits(b),
          s"bit drift: $a vs $b")
      }
    }
  }

  test("wire form is little-endian float32 in index order (numpy tobytes layout)") {
    val bytes = Seq(Tuple1(Array(1.0f, -2.0f))).toDF("vec")
      .select(VectorCodec.pack(col("vec"))).collect().head.getAs[Array[Byte]](0)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bytes.length == 8)
    assert(bb.getFloat(0) == 1.0f && bb.getFloat(4) == -2.0f)
  }

  test("ANN math is identical through the boundary") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(0.5f, -1.0f, 4.0f))).toDF("id", "vec")
    val q = array(lit(0.25f), lit(1.5f), lit(-0.75f))
    val rows = vecs.select(
        VectorExpressions.cosineSim(col("vec"), q).as("direct"),
        VectorExpressions.cosineSim(
          VectorCodec.unpack(VectorCodec.pack(col("vec"))), q).as("through"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("a null vector element fails loudly instead of silently packing 0.0f") {
    // the bit-round-trip contract has no representation for a null slot:
    // packing it as 0.0f would be silent corruption (review finding)
    val e = intercept[Exception] {
      Seq(Tuple1(Array[java.lang.Float](1.0f, null, 3.0f))).toDF("v")
        .select(VectorCodec.pack(col("v"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause).map(identity))
    assert(msgs(e).exists(m => m != null && m.contains("null element at index 1")))
  }

  test("malformed binary fails loudly instead of decoding garbage") {
    val e = intercept[Exception] {
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
        .select(VectorCodec.unpack(col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause).map(identity))
    assert(msgs(e).exists(m => m != null && m.contains("whole number of float32s")))
  }
}
