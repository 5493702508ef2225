package graft.functions.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Grouped top-k as a Catalyst-native TypedImperativeAggregate — the
  * aggregation-tier alternative to the window-rank idiom
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`).
  *
  * Why this is the better 100 TB plan: the window form shuffles EVERY
  * row of every group to its reducer and sorts there (WindowGroupLimit
  * trims late, after the exchange at best); this aggregate keeps a
  * k-bounded heap per group, so the map-side partial aggregation
  * already reduces each (mapper, group) to ≤ k rows — the shuffle
  * carries ≤ k·mappers rows per group instead of the group's full
  * cardinality, and merge unions heaps in O(k). State is k rows
  * regardless of input size — the same mergeable-sketch shape as
  * [[KmvDistinct]], applied to exact top-k.
  *
  * Semantics: `top_k_struct(s, k)` keeps the k LARGEST struct values
  * under the struct's lexicographic field ordering (SQL
  * `ORDER BY f1 DESC, f2 DESC, …`) and returns them as a
  * descending-sorted array. Give the struct a trailing unique field
  * (an id) and the result is a deterministic total-order top-k; NULL
  * structs are ignored (SQL aggregate convention).
  */
case class TopKStruct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, "top_k_struct needs k > 0")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_struct needs an orderable struct input, got $other")
  }

  @transient private lazy val ord: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[InternalRow]]

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    // ascending heap: peek() is the SMALLEST retained row, evicted
    // first once the buffer holds k entries
    new java.util.PriorityQueue[InternalRow](k + 1, ord)

  private def add(buf: java.util.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size() < k) { buf.offer(row); () }
    else if (ord.compare(row, buf.peek()) > 0) {
      buf.poll(); buf.offer(row); ()
    }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // copy: the evaluated struct aliases the scan's reused row buffer
    if (v != null) add(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(b1: java.util.PriorityQueue[InternalRow],
      b2: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    b2.forEach(r => add(b1, r))
    b1
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, ord.reverse)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { r =>
      val u = toUnsafe(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.getInt
      val rowBytes = new Array[Byte](size)
      in.get(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, size)
      buf.offer(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStruct =
    copy(child = newChild)
  override def prettyName: String = "top_k_struct"
}

object TopKStruct {
  /** Column-API entry point: `topK(struct(value, id), 3)`. */
  def topK(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      TopKStruct(GraftSqlBridge.toExpression(c), k).toAggregateExpression())
}
