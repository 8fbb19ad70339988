package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluation for the dedup/winnowing n-gram kernels.
  *
  * The lambda formulations (`array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', slice(words, i+1, n))))` and the winnow window-min tree)
  * are semantically exact but Spark's higher-order functions are
  * CodegenFallback: every shingle allocates through the lambda interpreter,
  * and — the measured dominant cost on the g1/g3 paths — the NESTED lambda
  * trees are large enough that Catalyst re-analyzes seconds of expression
  * tree per rep. Each expression here is the same computation as ONE fused
  * loop behind a single codegen-friendly node: tiny tree (analysis cost
  * gone), JIT-hot static helper (eval cost gone), BIT-IDENTICAL output —
  * grams are joined with `UTF8String.concatWs` (the exact `concat_ws`
  * kernel, null elements skipped), the winnow min uses `UTF8String.compare`
  * (the exact `array_min` binary string ordering), and dedup keeps first
  * occurrences in encounter order exactly like `array_distinct`. The DuckDB
  * oracle replays the SQL formulas over the same corpus and must keep
  * matching hash-for-hash.
  */
object ShingleOps {
  private val Space = UTF8String.fromString(" ")

  /** `array_distinct(transform(sequence(0, greatest(size(words)-n, 0)),
    * i -> concat_ws(' ', slice(words, i+1, n))))`, fused. A NULL words
    * array follows the lambda form's own degenerate path (size(null) is
    * null, greatest(null, 0) = 0, slice(null,..) = null, concat_ws skips
    * it): the result is `[""]`, never null.
    */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    if (words == null) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val s = words.numElements()
    val upper = math.max(s - n, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= upper) {
      val m = math.min(n, math.max(s - i, 0))
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) {
        parts(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      // concatWs allocates fresh bytes, so grams never alias a reused
      // UnsafeRow buffer (safe to retain across rows)
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** The winnow selection over a token array: grams are the word k-grams
    * (concat_ws(' ', slice(toks, i, k))), each window of `w` consecutive
    * grams selects its minimal gram with the RIGHTMOST occurrence on ties
    * (robust winnowing), results dedup on (pos, gram) keeping first
    * encounter order — exactly the lambda tree in
    * [[graft.operators.TextAnalysis.winnow]]. pos is the 1-based gram
    * position, as the lambda form computes it.
    */
  def winnowSelect(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val s = toks.numElements()
    val g = s - k + 1
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[UTF8String](g)
    var i = 0
    while (i < g) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      grams(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[(Int, UTF8String)]()
    var s0 = 0
    while (s0 <= g - w) {
      var best = grams(s0)
      var bestJ = 0
      var j = 1
      while (j < w) {
        // <= 0 keeps the RIGHTMOST minimal gram, the lambda form's
        // array_max(filter(sequence(1,w), j -> g[s+j] = mn))
        if (grams(s0 + j).compareTo(best) <= 0) { best = grams(s0 + j); bestJ = j }
        j += 1
      }
      seen.add((s0 + bestJ + 1, best))
      s0 += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val (pos, gram) = it.next()
      out(o) = new GenericInternalRow(Array[Any](pos, gram))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles of a words array — the fused native form
  * of [[graft.operators.Dedup.wordShinglesFromWords]]'s lambda tree. Never
  * null (a null input degenerates to `[""]`, matching the lambda form).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be positive, got $n")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleOps.shingles(
      if (v == null) null else v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleOps.shingles(
            ${c.isNull} ? null :
              (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The winnow (pos, gram) selection array — the fused native form of the
  * nested lambda tree in [[graft.operators.TextAnalysis.winnow]]. Null
  * input → null (the operator filters short/null token arrays upstream).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k/w must be positive: $k/$w")

  override def prettyName: String = "winnow_select"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = true),
      StructField("gram", StringType, nullable = true))),
    containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    ShingleOps.winnowSelect(t.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.ShingleOps.winnowSelect($t, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
