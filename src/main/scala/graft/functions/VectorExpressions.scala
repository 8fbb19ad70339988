package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §4: "cosine /
  * MinHash ... perf may want custom Expression" — this is that
  * specialization).
  *
  * Why not higher-order functions: `aggregate(zip_with(a,b,*),0,+)` builds
  * an intermediate array and boxes every element through the lambda
  * interpreter — three passes and O(n) allocations per row. These
  * expressions are one fused loop, participate in whole-stage codegen
  * (doGenCode below), and keep the exact left-to-right double summation
  * order of the HOF formulation, so results are bit-identical with the
  * DuckDB oracle's sequential fold.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
}

/** dot(a, b) over float vectors, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a| * |b|); null when either norm is zero. One
  * fused pass computes dot and both norms.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH signatures in ONE fused pass: output[t] is the
  * planesPerTable-bit signature of table t (bit p = sign of the dot with
  * plane (t,p)). Replaces numTables*planesPerTable separate dot-expression
  * trees — the unfused form spent more time in codegen/compile than in
  * compute. `planes` is the flattened [tables x planesPerTable x dim]
  * matrix, baked into the generated code as a reference object.
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Float],
    numTables: Int,
    planesPerTable: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dim: Int = planes.length / (numTables * planesPerTable)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](numTables)
    var idx = 0
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var p = 0
      while (p < planesPerTable) {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += arr.getFloat(i).toDouble * planes(idx + i); i += 1 }
        if (dot >= 0) sig |= (1L << p)
        idx += dim
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$numTables];
         |int $idx = 0;
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ((double) $v.getFloat($i)) * $planesRef[$idx + $i];
         |    }
         |    if ($dot >= 0) $sig |= (1L << $p);
         |    $idx += $dim;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All-centroid dot scores in one fused loop: score[c] = dot(vec, cents[c])
  * over a flat row-major centroid matrix carried as a plan reference.
  * Replaces nCentroids parallel DotProduct trees — at 16×64 literals those
  * cost seconds of codegen per (re)planned Lloyd iteration; this compiles
  * to one short nested loop whatever the centroid count.
  */
case class CentroidScores(child: Expression, cents: Array[Float], nCentroids: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dim: Int = cents.length / nCentroids

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Double](nCentroids)
    var c = 0
    while (c < nCentroids) {
      var dot = 0.0
      val base = c * dim
      var i = 0
      while (i < n) { dot += arr.getFloat(i).toDouble * cents(base + i); i += 1 }
      out(c) = dot
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$nCentroids];
         |for (int $c = 0; $c < $nCentroids; $c++) {
         |  double $dot = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.getFloat($i)) * $centsRef[$base + $i];
         |  }
         |  $out[$c] = $dot;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode: for each of `m` subspaces, the index of the Euclidean-nearest
  * codeword in that subspace's codebook. cents is flat row-major:
  * cents(((s*k)+c)*dsub + i). One fused loop, array<int> out.
  */
case class PqEncode(child: Expression, cents: Array[Float], m: Int, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dsub: Int = cents.length / (m * k)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        val base = (s * k + c) * dsub
        var i = 0
        while (i < dsub) {
          val idx = s * dsub + i
          val x = if (idx < arr.numElements()) arr.getFloat(idx).toDouble else 0.0
          val diff = x - cents(base + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val base = ctx.freshName("base")
      val idx = ctx.freshName("idx"); val x = ctx.freshName("x"); val diff = ctx.freshName("diff")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    int $base = ($s * $k + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $idx = $s * $dsub + $i;
         |      double $x = $idx < $v.numElements() ? (double) $v.getFloat($idx) : 0.0;
         |      double $diff = $x - $centsRef[$base + $i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ query lookup table: lut(s*k + c) = dot(query_subvector_s, codeword_sc).
  * Built once per query row; ADC then scores any candidate with m lookups.
  */
case class PqLut(child: Expression, cents: Array[Float], m: Int, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dsub: Int = cents.length / (m * k)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        var dot = 0.0
        val base = (s * k + c) * dsub
        var i = 0
        while (i < dsub) {
          val idx = s * dsub + i
          val x = if (idx < arr.numElements()) arr.getFloat(idx).toDouble else 0.0
          dot += x * cents(base + i); i += 1
        }
        out(s * k + c) = dot
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      val idx = ctx.freshName("idx"); val x = ctx.freshName("x")
      s"""
         |double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $dot = 0.0;
         |    int $base = ($s * $k + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $idx = $s * $dsub + $i;
         |      double $x = $idx < $v.numElements() ? (double) $v.getFloat($idx) : 0.0;
         |      $dot += $x * $centsRef[$base + $i];
         |    }
         |    $out[$s * $k + $c] = $dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: sum over subspaces of lut(s*k + codes(s)) — the approximate
  * dot(query, candidate) in m array lookups. */
case class PqAdc(codes: Expression, lut: Expression, k: Int) extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, lut.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<int>, array<double>), got $a / $b")
  }

  // BOUNDS ARE LOAD-BEARING: UnsafeArrayData.getDouble does NOT bounds-
  // check, so codes from an index built with a different k (a stale-index
  // mix) would read arbitrary off-heap memory and rank candidates by
  // garbage with no error. One comparison per lookup buys a loud failure.
  override def nullSafeEval(c: Any, l: Any): Any = {
    val cArr = c.asInstanceOf[ArrayData]
    val lArr = l.asInstanceOf[ArrayData]
    var sum = 0.0
    var s = 0
    val n = cArr.numElements()
    val lutLen = lArr.numElements()
    while (s < n) {
      val idx = s * k + cArr.getInt(s)
      if (idx < 0 || idx >= lutLen)
        throw new IllegalArgumentException(
          s"pq_adc: code ${cArr.getInt(s)} at subspace $s indexes past the $lutLen-entry LUT " +
            s"(k=$k) — codes and codebooks come from different builds")
      sum += lArr.getDouble(idx)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val sum = ctx.freshName("sum"); val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val idx = ctx.freshName("idx"); val lutLen = ctx.freshName("lutLen")
      s"""
         |double $sum = 0.0;
         |int $n = $c.numElements();
         |int $lutLen = $l.numElements();
         |for (int $s = 0; $s < $n; $s++) {
         |  int $idx = $s * $k + $c.getInt($s);
         |  if ($idx < 0 || $idx >= $lutLen) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code indexes past the LUT (k=$k) — codes and codebooks come from different builds");
         |  }
         |  $sum += $l.getDouble($idx);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)
}

object VectorExpressions {
  /** Column API over the native expressions. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def centroidScores(v: Column, cents: Array[Array[Float]]): Column = {
    val n = cents.length
    val flat = new Array[Float](cents.map(_.length).sum)
    var off = 0
    cents.foreach { c => System.arraycopy(c, 0, flat, off, c.length); off += c.length }
    Bridge.column(CentroidScores(Bridge.expression(v), flat, n))
  }

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** `iceberg_bucket(n, v)` — the Iceberg spec's bucket transform as a
    * dedicated type-checked expression ([[graft.functions.IcebergBucket]];
    * round-9 advice retired the composed Cast+Murmur3Hash form, which
    * silently hashed strings as null-longs and timestamps as seconds):
    * the SQL-side companion of
    * [[graft.sources.IcebergInterop.exportIcebergBucketed]] — a spark.sql
    * user locates a key's bucket to prune an exported table by hand.
    * int/long/date/timestamp/string values only, enforced at analysis;
    * null → null; n < 1 throws, matching the writer's stance. */
  private def icebergBucketExpr(children: Seq[Expression]): Expression = {
    require(children.size == 2, "iceberg_bucket(n, v) takes exactly two arguments")
    graft.functions.IcebergBucket(children(0), children(1))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))),
    (FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[graft.functions.IcebergBucket].getName,
        "iceberg_bucket"),
      icebergBucketExpr _)
  )
}

// The session-extension entry point that registers these functions (plus
// the masking rule and the native as-of strategy) is
// org.apache.spark.sql.graft.GraftExtensions.
