package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** THE vector-type adapter boundary (round-6 verdict #8).
  *
  * Everywhere inside the engine, an embedding is `ArrayType(FloatType)` —
  * the reference's EMBEDDING value type (feature_registry.py:42, SURVEY
  * §1.3) and the shape every ANN operator (Similarity / Pq / AnnIndex)
  * consumes. Spark's vector-type story is moving (VariantType landed in
  * 4.x; a first-class vector UDT keeps being discussed), and external
  * stores disagree on wire forms — so the PORTABLE contract lives here,
  * at the table edge, in exactly two functions:
  *
  *   - [[VectorCodec.pack]]:   array<float> -> binary (little-endian
  *     IEEE-754 float32, index order — the wire form faiss, numpy
  *     `.tobytes()`, pgvector, and Arrow FixedSizeList all reduce to)
  *   - [[VectorCodec.unpack]]: binary -> array<float> (exact bit
  *     round-trip, NaN payloads and signed zeros included)
  *
  * If/when the engine adopts a different in-memory vector type, ONLY this
  * boundary changes: operators keep their `array<float>` inputs, tables
  * keep their binary bytes, and the two casts swap implementations. Both
  * directions are native codegen'd expressions (no UDF boxing) so the
  * boundary costs one fused loop per row.
  */
case class PackFloats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_pack"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      // A null element has no bit pattern: packing it as 0.0f would corrupt
      // the "exact bit round-trip" contract silently. Fail loudly instead.
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_pack: null element at index $i — a packed vector must be dense")
      // raw bits, not value conversion: NaN payloads and -0.0 survive
      val bits = java.lang.Float.floatToRawIntBits(arr.getFloat(i))
      out(i * 4) = bits.toByte
      out(i * 4 + 1) = (bits >>> 8).toByte
      out(i * 4 + 2) = (bits >>> 16).toByte
      out(i * 4 + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val bits = ctx.freshName("bits")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n * 4];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "vec_pack: null element at index " + $i + " — a packed vector must be dense");
         |  }
         |  int $bits = java.lang.Float.floatToRawIntBits($a.getFloat($i));
         |  $out[$i * 4] = (byte) $bits;
         |  $out[$i * 4 + 1] = (byte) ($bits >>> 8);
         |  $out[$i * 4 + 2] = (byte) ($bits >>> 16);
         |  $out[$i * 4 + 3] = (byte) ($bits >>> 24);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UnpackFloats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_unpack"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    require(bytes.length % 4 == 0,
      s"vec_unpack: ${bytes.length} bytes is not a whole number of float32s " +
        "— the binary column does not hold a packed vector")
    val n = bytes.length / 4
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Float.intBitsToFloat(
        (bytes(i * 4) & 0xFF) |
          ((bytes(i * 4 + 1) & 0xFF) << 8) |
          ((bytes(i * 4 + 2) & 0xFF) << 16) |
          ((bytes(i * 4 + 3) & 0xFF) << 24))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |if ($b.length % 4 != 0) {
         |  throw new IllegalArgumentException(
         |    "vec_unpack: " + $b.length + " bytes is not a whole number of float32s" +
         |    " — the binary column does not hold a packed vector");
         |}
         |int $n = $b.length / 4;
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = java.lang.Float.intBitsToFloat(
         |    ($b[$i * 4] & 0xFF) | (($b[$i * 4 + 1] & 0xFF) << 8) |
         |    (($b[$i * 4 + 2] & 0xFF) << 16) | (($b[$i * 4 + 3] & 0xFF) << 24));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorCodec {
  /** array<float> -> little-endian float32 binary (the table-edge wire
    * form; see the class doc above for the portability contract). */
  def pack(v: Column): Column = Bridge.column(PackFloats(Bridge.expression(v)))

  /** little-endian float32 binary -> array<float> (exact bit round-trip). */
  def unpack(v: Column): Column = Bridge.column(UnpackFloats(Bridge.expression(v)))
}
