package graft.functions.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketch as a Catalyst-native
  * TypedImperativeAggregate — the MERGEABLE-sketch aggregation tier
  * (SURVEY.md §2-B "custom TypedImperativeAggregate" row): partial
  * sketches build map-side, `merge` unions them after the shuffle,
  * and the final buffer is tiny (≤ k longs) regardless of input
  * cardinality — the shape that lets 1000 executors estimate
  * distinct counts over 100 TB with k·8-byte state per group.
  *
  * Estimator: keep the k smallest DISTINCT 48-bit hashes
  * h = int(md5(value)[0..6 bytes]); if fewer than k distinct hashes
  * exist the count is exact, else estimate (k-1)·2^48 / h_(k) (the
  * classic KMV/bottom-k estimator).
  *
  * Unlike HLL sketches (engine-specific bit layouts — the reason
  * q_agg_approx is rows-only), every step here is pure md5 + integer
  * arithmetic, so a DuckDB oracle reproduces the estimate EXACTLY —
  * approximate distinct-count becomes hash-gradeable
  * (q_approx_kmv).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, "kmv_distinct needs k > 1")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a string input, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** 48-bit hash = first 6 bytes of md5, big-endian (== the SQL-side
    * positional decode of the first 12 hex chars). */
  private def hash48(s: UTF8String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size() < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.remove(buf.last()); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, hash48(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b2.forEach(h => add(b1, h))
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble * math.pow(2.0, 48) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach(h => out.writeLong(h))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** Column-API entry point. */
  def kmv(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      KmvDistinct(GraftSqlBridge.toExpression(c), k).toAggregateExpression())
}
