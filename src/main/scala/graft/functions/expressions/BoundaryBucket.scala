package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Codegen'd boundary bucketing: the number of cuts ≤ key — i.e. the
  * bucket index under an explicit ascending cut vector — via binary
  * search over a constant `double[]`.
  *
  * Why a custom Catalyst expression (round-7 ADVICE on
  * PrefixOps.runningSums' explicit-boundaries path): the declarative
  * form — a foldLeft chain of |cuts| nested `when(k >= cut, 1)
  * .otherwise(0)` adds — is O(|cuts|) per row AND deepens the codegen
  * expression tree linearly, so the "thousands of sampled cuts at
  * 100 TB" the scaladoc recommends would blow the 64 KB JIT method
  * limit into interpreted fallback. This expression is O(log |cuts|)
  * per row inside whole-stage codegen at any cut count.
  *
  * Exact semantics of the replaced when-chain (Spark SQL comparison
  * semantics, NOT Java's):
  *  - NULL key → 0 (each `when` is null → otherwise 0), and the
  *    output is NEVER null;
  *  - NaN key → |cuts| (Spark orders NaN larger than every double,
  *    so every `k >= cut` is true);
  *  - -0.0 == 0.0 (both semantics agree);
  *  - ties with a cut: `>=` ⇒ the row lands ABOVE the cut.
  * Cuts must be finite (the callers sample finite quantiles); they
  * are sorted defensively at construction.
  */
case class BoundaryBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  private val sortedCuts: Array[Double] = {
    require(cuts.nonEmpty, "BoundaryBucket needs at least one cut")
    require(cuts.forall(c => !c.isNaN && !c.isInfinite),
      "BoundaryBucket cuts must be finite")
    val a = cuts.clone(); java.util.Arrays.sort(a); a
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"BoundaryBucket needs a double key, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else BoundaryBucket.bucketOf(sortedCuts, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", sortedCuts, "double[]")
    val childGen = child.genCode(ctx)
    val k = ctx.freshName("k")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val code =
      code"""
        ${childGen.code}
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          double $k = ${childGen.value};
          if (Double.isNaN($k)) {
            ${ev.value} = $cutsRef.length;
          } else {
            int $lo = 0;
            int $hi = $cutsRef.length;
            while ($lo < $hi) {
              int $mid = ($lo + $hi) >>> 1;
              if ($cutsRef[$mid] <= $k) { $lo = $mid + 1; } else { $hi = $mid; }
            }
            ${ev.value} = $lo;
          }
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BoundaryBucket = copy(child = newChild)
}

object BoundaryBucket {
  /** Upper bound: #{cuts(i) ≤ k}; NaN k counts every cut (Spark's
    * NaN-largest ordering, which the replaced `k >= cut` when-chain
    * followed). Primitive `<=` agrees with Spark for every finite
    * double incl. ±0.0. */
  def bucketOf(sortedCuts: Array[Double], k: Double): Int = {
    if (k.isNaN) return sortedCuts.length
    var lo = 0
    var hi = sortedCuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sortedCuts(mid) <= k) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column-API entry point (key must already be double). */
  def bucket(key: Column, cuts: Seq[Double]): Column =
    GraftSqlBridge.toColumn(
      BoundaryBucket(GraftSqlBridge.toExpression(key), cuts.toArray))
}
