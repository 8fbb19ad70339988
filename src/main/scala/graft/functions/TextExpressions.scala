package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression backing [[graft.operators.TextAnalysis.hashedNgramScore]].
  *
  * The lambda formulation (`aggregate` over bigrams of an `aggregate`
  * over `sequence(1, length(bg))` of `ascii(substring(...))`) is
  * semantically exact but Spark's higher-order functions are
  * CodegenFallback: every character allocates through the lambda
  * interpreter — measured ~2 ms/doc (10 s for the sf0.1 corpus). This
  * expression is the same arithmetic as ONE fused loop (no bigram
  * string is even materialized — the char fold runs across token,
  * joiner, token), participates in whole-stage codegen via a static
  * JIT-hot helper, and is BIT-IDENTICAL to the lambda form: same code
  * points, same modular steps, same left-to-right double accumulation —
  * the DuckDB oracle is unchanged.
  */
object HashedNgram {
  val P = 1000003L
  val Scramble = 2654435761L

  /** Fold `s`'s code points into h: h ← (h·31 + cp) mod P, left to right
    * (matches `ascii(substring(s, i, 1))` per character — full code
    * points, not UTF-16 units).
    */
  def foldString(h0: Long, s: UTF8String): Long = {
    val str = s.toString
    var h = h0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Σ over adjacent token pairs of the slot weight
    * `((polyhash(a + ' ' + b) mod buckets) · Scramble mod P) / P − ½`,
    * accumulated left to right in double. Boxed so codegen can signal
    * null: a null token nulls the whole sum, exactly like the lambda
    * form's null propagation through `concat`/`aggregate`.
    */
  def wsumBoxed(tokens: ArrayData, buckets: Int): java.lang.Double = {
    val n = tokens.numElements()
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      if (tokens.isNullAt(i) || tokens.isNullAt(i + 1)) return null
      var h = foldString(0L, tokens.getUTF8String(i))
      h = (h * 31 + 32L) % P // the ' ' joiner, ascii 32
      h = foldString(h, tokens.getUTF8String(i + 1))
      acc += (h % buckets) * Scramble % P / 1000003.0 - 0.5
      i += 1
    }
    acc
  }

  def wsum(tokens: Column, buckets: Int): Column =
    Bridge.column(HashedBigramWsum(Bridge.expression(tokens), buckets))
}

/** Sum of hashed-bigram slot weights over a token array (see
  * [[HashedNgram.wsumBoxed]] for the exact arithmetic). Null input →
  * null; a null ELEMENT also nulls the result (lambda-form parity).
  */
case class HashedBigramWsum(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def prettyName: String = "hashed_bigram_wsum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    HashedNgram.wsumBoxed(t.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.HashedNgram.wsumBoxed($t, $buckets);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
