package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, NumericType}

/** Fixed-bin histogram as a Catalyst-native TypedImperativeAggregate —
  * the aggregation-tier alternative to the groupBy-bin-then-pivot
  * idiom.
  *
  * Why this is the better 100 TB plan: the relational form shuffles
  * one row PER (group, bin) and needs a second pass (pivot / list
  * agg) to assemble the vector; this aggregate keeps the whole
  * histogram as a `bins`-long array in the aggregation buffer, so
  * map-side partial aggregation reduces each (mapper, group) to ONE
  * `bins`-element state and merge is an O(bins) vector add —
  * order-independent (integer adds commute), hence deterministic
  * under any partitioning. Same mergeable-state shape as
  * [[KmvDistinct]] / [[TopKStruct]].
  *
  * Semantics: `hist_fixed(x, lo, hi, bins)` buckets
  * `floor((x − lo)·bins / (hi − lo))` clamped to [0, bins−1] (the
  * house bounded-grid binning), ignores NULL and NaN inputs, and
  * returns the counts as an ARRAY<BIGINT> of length `bins`.
  */
case class HistFixed(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bins > 0, "hist_fixed needs bins > 0")
  require(hi > lo, "hist_fixed needs hi > lo")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_fixed needs a numeric input, got $other")
  }

  private val binsD = bins.toDouble
  private val range = hi - lo

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case _ => v.asInstanceOf[Number].doubleValue()
      }
      if (!x.isNaN) {
        val raw = math.floor((x - lo) * binsD / range)
        val idx = if (raw < 0d) 0
          else if (raw > (bins - 1).toDouble) bins - 1
          else raw.toInt
        buf(idx) += 1L
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bins)
    var i = 0
    while (i < bins) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bins)
    var i = 0
    while (i < bins) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistFixed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistFixed =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistFixed =
    copy(child = newChild)
  override def prettyName: String = "hist_fixed"
}

object HistFixed {
  /** Column-API entry point: `hist(col("value"), 0.0, 100.0, 20)`. */
  def hist(c: Column, lo: Double, hi: Double, bins: Int): Column =
    GraftSqlBridge.toColumn(
      HistFixed(GraftSqlBridge.toExpression(c), lo, hi, bins)
        .toAggregateExpression())
}
