package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as ONE mergeable aggregate: a bounded
  * map of `numCounters` (item -> lower-bound count) that finds every item
  * with true frequency > n/(numCounters+1) in one pass over any
  * partitioning — the frequency-sketch sibling of HLL (cardinality) and
  * MinHashSig (similarity) in this engine's sketch family.
  *
  * Sketch contract (the spec pins both bounds): each reported count is a
  * LOWER bound on the true count, short by at most n/(numCounters+1); any
  * item whose true count exceeds that bound is guaranteed present. Merge
  * follows the mergeable-summaries construction (Agarwal et al., PODS'12):
  * sum counters pairwise, then subtract the (numCounters+1)-th largest
  * count and drop non-positives — associativity of the ERROR BOUND (not of
  * exact counter values) is what makes map-side partial aggregation safe,
  * so the sketch holds under Spark's partial/final split with bounded
  * memory at any scale. Exact counter values can differ across merge
  * orders; production reads therefore treat the sketch as a CANDIDATE set
  * and re-count candidates exactly (see g3_heavy_hitters), the same
  * verify-the-sketch shape as LSH.
  */
case class MisraGries(
    child: Expression,
    numCounters: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if numCounters > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("numCounters must be positive")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $t")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1)
        case None if buffer.size < numCounters => buffer.update(key, 1L)
        case None =>
          // classic MG step: a non-tracked arrival decrements every counter
          // (one "vote" cancels one of each); zeros free their slots
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.keysIterator.foreach { k =>
            val c = buffer(k) - 1
            if (c == 0L) dead += k else buffer.update(k, c)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buffer.update(k, buffer.getOrElse(k, 0L) + c) }
    if (buffer.size > numCounters) {
      // subtract the (numCounters+1)-th largest count from everything and
      // drop non-positives — at most numCounters survive, bound preserved
      val threshold = buffer.values.toArray.sorted(Ordering[Long].reverse).apply(numCounters)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { k =>
        val c = buffer(k) - threshold
        if (c <= 0L) dead += k else buffer.update(k, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // deterministic output order: count desc, item asc
    val rows = buffer.toArray.sortBy { case (k, c) => (-c, k) }.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val byteArrays = entries.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + byteArrays.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(byteArrays).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** array<struct<item,count>> of ≤ numCounters candidate heavy hitters,
    * sorted (count desc, item asc). Counts are lower bounds. */
  def heavyHitters(item: Column, numCounters: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(item), numCounters).toAggregateExpression())
}
