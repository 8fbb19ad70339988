package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate over struct values: keeps the k GREATEST structs
  * by their natural (lexicographic) ordering, returned sorted descending.
  *
  * Why an aggregate and not a window: `row_number() <= k` ships EVERY input
  * row through the shuffle and sorts each partition; this aggregate keeps a
  * k-element min-heap per map task, so only k rows per partition cross the
  * wire (classic partial-aggregable top-k — the thing that makes per-query
  * KNN viable when the candidate side is the 100 TB corpus).
  *
  * Determinism contract: callers encode the ordering INTO the struct prefix
  * (e.g. struct(score, -id, payload...)) so no two inputs compare equal
  * before a unique field — then the result is independent of partitioning.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes = structType.fields.map(_.dataType).toSeq
  // ascending natural ordering; heap head = smallest of the kept k
  private lazy val rowOrd: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(fieldTypes)
  private lazy val toUnsafe = UnsafeProjection.create(fieldTypes.toArray)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // orderability gate at ANALYSIS time (like Spark's own order-sensitive
    // aggregates): a struct holding e.g. a map field would otherwise pass
    // here and crash in createNaturalAscendingOrdering as an executor task
    // failure instead of a clean analysis error
    case s: StructType if !RowOrdering.isOrderable(s) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable struct; ${s.simpleString} is not")
    case _: StructType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StructType => TypeCheckResult.TypeCheckFailure("k must be positive")
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a struct input, got $t")
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](rowOrd.asInstanceOf[Ordering[UnsafeRow]].reverse) // min-heap

  override def update(
      buffer: mutable.PriorityQueue[UnsafeRow],
      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buffer.size < k) {
        buffer.enqueue(toUnsafe(row).copy())
      } else if (rowOrd.compare(row, buffer.head) > 0) {
        buffer.dequeue()
        buffer.enqueue(toUnsafe(row).copy())
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[UnsafeRow],
      other: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    other.foreach { row =>
      if (buffer.size < k) buffer.enqueue(row)
      else if (rowOrd.compare(row, buffer.head) > 0) { buffer.dequeue(); buffer.enqueue(row) }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(buffer.toArray.sorted(rowOrd.asInstanceOf[Ordering[UnsafeRow]].reverse).map(identity[Any]))

  override def serialize(buffer: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { row =>
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(fieldTypes.size)
      row.pointTo(arr, len)
      buf.enqueue(row)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKStructs {
  /** Column API: topK(struct(score, tiebreak, payload...), k) -> array of
    * structs, greatest first. */
  def topK(structCol: Column, k: Int): Column =
    Bridge.column(TopKStructs(Bridge.expression(structCol), k).toAggregateExpression())
}
