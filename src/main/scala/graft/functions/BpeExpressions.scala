package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for BPE encoding (round-6 verdict #3:
  * retire `encodeDocUdf`). A Scala UDF is an opaque box to codegen — every
  * row pays CatalystTypeConverters boxing on the way in AND a converted
  * Seq[Seq[String]] -> ArrayData materialization on the way out. These
  * expressions stay inside whole-stage codegen (doGenCode emits one static
  * call), read the UTF8String directly, and build ArrayData without the
  * Scala-collection detour. The merge-rank table rides the generated code
  * as a reference object — dimension-scale metadata, the same shape as
  * [[HyperplaneBuckets]]' plane matrix.
  */
abstract class BpeExpression extends UnaryExpression {
  def merges: Seq[(String, String)]
  @transient protected lazy val ranks: Map[(String, String), Int] = Bpe.ranksOf(merges)

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }

  protected def ranksRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("bpeRanks", ranks, "scala.collection.immutable.Map")
}

/** text -> `array<array<string>>`: one token array per whitespace word —
  * the shape the lossless/fixpoint certificates inspect. */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
  extends BpeExpression {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def nullSafeEval(v: Any): Any =
    Bpe.encodeDocData(v.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ranksRef(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeDocData($c.toString(), $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> total subword count — the corpus-budget / chunk / pack unit. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends BpeExpression {

  override def prettyName: String = "bpe_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ranksRef(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c.toString(), $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  /** Column API for [[BpeEncodeWords]]. */
  def encode(merges: Seq[(String, String)])(text: Column): Column =
    Bridge.column(BpeEncodeWords(Bridge.expression(text), merges))

  /** Column API for [[BpeTokenCount]]. */
  def count(merges: Seq[(String, String)])(text: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))
}
