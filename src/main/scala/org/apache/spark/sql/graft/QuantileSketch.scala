package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch column (Greenwald-Khanna summaries — the same
  * structure behind Spark's approx_percentile, here exposed as a
  * persistable BINARY sketch so quantiles join the engine's sketch-table
  * family: Misra-Gries (frequency), DataSketches HLL (distinct count),
  * MinHashSig (similarity), and now GK (rank/quantile). The lakehouse
  * pattern is identical for all four: persist one small sketch per
  * partition/day, answer range queries by MERGING sketches instead of
  * rescanning data — at 100 TB that turns "p99 latency last quarter" into
  * a metadata-scale aggregation.
  *
  * Contract (pinned by QuantileSketchSpec): a query at quantile q returns a
  * value whose true rank is within relativeError·n of q·n for a
  * single-pass sketch; MERGING ADDS the operands' rank-error terms (GK is
  * only heuristically mergeable — Spark's merge inflates deltas by
  * 2·ε·count per operand), so a sketch table must budget the per-partition
  * epsilon for its merge fan-in: merging D partition sketches at read time
  * needs the write-time epsilon ~D× finer than the target read error
  * (e16_quantile_sketch uses ε=0.001 per day for 30-day merges; measured
  * p99 within 1% of exact, vs snapping to the max at ε=0.01). Exact
  * estimates may differ across merge structures inside the bound, which is
  * why queries over this sketch are rows-only/spec-checked, never
  * hash-oracled.
  */
object QuantileSketchCodec {
  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val sampled = c.sampled
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + sampled.length * 24)
    bb.putInt(c.compressThreshold)
    bb.putDouble(c.relativeError)
    bb.putLong(c.count)
    bb.putInt(sampled.length)
    sampled.foreach { s => bb.putDouble(s.value); bb.putLong(s.g); bb.putLong(s.delta) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    // validate SHAPE before trusting the element count: merge/query accept
    // any BinaryType column, so corrupt or non-sketch bytes must fail with
    // a diagnosable message, not BufferUnderflow / NegativeArraySize / a
    // multi-GB Array.fill from a garbage length word
    require(bytes != null && bytes.length >= 24,
      s"not a serialized quantile sketch: ${if (bytes == null) "null" else s"${bytes.length} bytes"}")
    val bb = ByteBuffer.wrap(bytes)
    val threshold = bb.getInt
    val relErr = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    require(n >= 0 && bytes.length == 24 + n.toLong * 24,
      s"corrupt quantile sketch: declared $n entries but ${bytes.length} bytes")
    val sampled = Array.fill(n)(
      QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(threshold, relErr, sampled, count, true)
  }
}

/** Aggregates raw doubles into a serialized GK sketch (BinaryType). */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType if relativeError > 0 && relativeError < 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _: NumericType =>
      TypeCheckResult.TypeCheckFailure("relativeError must be in (0, 1)")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires numeric input, got $t")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty[QuantileSummaries.Stats], 0L, false)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      // DecimalType passes checkInputDataTypes (NumericType) but evals to
      // Spark's Decimal, which is NOT a java.lang.Number — without this arm
      // a decimal column analyzed fine and then MatchError'd at execution
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
    })
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries = {
    val a = buffer.compress()
    val b = other.compress()
    if (b.count == 0L) a else if (a.count == 0L) b else a.merge(b)
  }

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchCodec.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merges ALREADY-SERIALIZED sketches (BinaryType in, BinaryType out) — the
  * range-query half of the sketch-table pattern. */
case class QuantileSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quantile_sketch_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary input, got $t")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, QuantileSummaries.defaultRelativeError,
      Array.empty[QuantileSummaries.Stats], 0L, false)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = QuantileSketchCodec.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer.count == 0L) incoming
      else if (incoming.count == 0L) buffer
      else buffer.compress().merge(incoming)
    }
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
    if (other.count == 0L) buffer
    else if (buffer.count == 0L) other
    else buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchCodec.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar: query a serialized sketch at quantile q — one row per group, so
  * interpreted evaluation (CodegenFallback) costs nothing measurable. */
case class QuantileSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch_query"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (binary, double), got ($l, $r)")
  }

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val qs = QuantileSketchCodec.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (qs.count == 0L) null
    else qs.query(q.asInstanceOf[Double]).map(Double.box).orNull
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantileSketch {
  /** The write-time (per-partition) epsilon needed so that merging up to
    * `fanIn` sketches still answers within `targetError` relative rank
    * error at read time. GK merge ADDS the operands' error terms (see the
    * class doc — Spark's merge inflates deltas by 2·ε·count per operand),
    * so a sketch table built for D-way range merges must write each
    * partition's sketch ~D× finer than the read-time target. This helper
    * makes the budgeting explicit at table-build time instead of a trap
    * discovered when a 30-day merge snaps p99 to the max:
    * `sketchAgg(col, budgetFor(0.03, fanIn = 30))`.
    */
  def budgetFor(targetError: Double, fanIn: Int): Double = {
    require(targetError > 0 && targetError < 1,
      s"targetError must be in (0, 1), got $targetError")
    require(fanIn >= 1, s"fanIn must be >= 1, got $fanIn")
    targetError / fanIn
  }

  /** Binary GK sketch of a numeric column at the given relative rank error. */
  def sketchAgg(value: Column, relativeError: Double = 0.01): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(value), relativeError).toAggregateExpression())

  /** Merge of serialized sketches (range queries over a sketch table). */
  def mergeAgg(sketch: Column): Column =
    Bridge.column(QuantileSketchMergeAgg(Bridge.expression(sketch)).toAggregateExpression())

  /** Value at quantile q from a serialized sketch. */
  def query(sketch: Column, q: Double): Column =
    Bridge.column(QuantileSketchQuery(
      Bridge.expression(sketch),
      Bridge.expression(org.apache.spark.sql.functions.lit(q))))
}
