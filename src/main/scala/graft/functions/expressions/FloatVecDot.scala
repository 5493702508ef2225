package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float vectors, accumulated
  * left-to-right in double.
  *
  * Why a custom Catalyst expression (SURVEY.md §4, optional row (a)):
  * the declarative form `aggregate(zip_with(a,b,_*_),0d,_+_)` is
  * semantically identical but higher-order functions execute
  * INTERPRETED — a lambda call per element, boxed accumulators, and a
  * codegen fence around the whole projection. This expression emits a
  * tight primitive loop inside whole-stage codegen.
  *
  * Bit-compatibility contract: float→double widening is exact and the
  * accumulation order is the same sequential left fold as the
  * higher-order form, so swapping one for the other cannot change a
  * single bit of any query result (the DuckDB oracle parity proves it
  * per run).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Elements may be null even when the array itself is not. */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elementsNullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"FloatVecDot needs two array<float> args, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element ⇒ null result, matching the declarative
      // aggregate(zip_with(a,b,_*_)) fold this expression claims
      // bit-compatibility with (null * x = null, null + x = null)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // fail fast on mismatched dims: a truncated partial dot is a
      // plausible-looking wrong answer (mixed embedding models)
      // the per-element null check is emitted only when the schema
      // says elements CAN be null — containsNull=false arrays keep the
      // branch-free loop (and ev.isNull may be a constant then)
      val nullCheck =
        if (elementsNullable)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) {
             |    ${ev.isNull} = true;
             |    break;
             |  }""".stripMargin
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: mismatched vector lengths " + $n + " vs " + $y.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      FloatVecDot(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
