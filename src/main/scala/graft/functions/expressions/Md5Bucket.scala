package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd deterministic hash bucketing (SURVEY.md §4 optional row
  * (a), fifth custom expression): `md5_bucket(key, m)` = the first
  * 24 bits of md5(key), mod m — BIT-IDENTICAL to the SQL
  * construction the graded queries share with the DuckDB oracle
  * (`instr('0123456789abcdef', substr(md5(k), j, 1))` summed over
  * the first 6 hex chars: 6 hex chars = 3 bytes = the top 24 bits).
  *
  * Why an expression and not the SQL formula: the composed form
  * renders the full 32-char hex string and then runs 6 substr+instr
  * probes per row; this kernel runs ONE digest over the raw UTF-8
  * bytes and masks 3 bytes — no hex materialization, no string
  * scans — while any oracle engine keeps evaluating the portable
  * SQL spelling. Content-addressed bucketing (sampling, fold
  * assignment, salting, shard routing) sits on the hot path of
  * every deterministic pipeline, so it earns the codegen treatment.
  *
  * Null semantics: null in either argument → null (BinaryExpression
  * default). m must be positive; the 24-bit value is non-negative,
  * so `% m` is already the mathematical mod.
  */
case class Md5Bucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_bucket needs (string, int) args, got ${left.dataType} and ${right.dataType}")

  override def nullSafeEval(key: Any, mod: Any): Any =
    Md5Bucket.bucket(key.asInstanceOf[UTF8String], mod.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, m) =>
      s"${ev.value} = graft.functions.expressions.Md5Bucket.bucket($k, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Bucket =
    copy(left = newLeft, right = newRight)
}

object Md5Bucket {

  /** Column-API entry point. */
  def md5Bucket(key: Column, mod: Column): Column =
    GraftSqlBridge.toColumn(
      Md5Bucket(GraftSqlBridge.toExpression(key),
        GraftSqlBridge.toExpression(mod)))

  /** The full 24-bit domain: md5_bucket(k, RAW) is exactly the
    * 6-hex-char integer the SQL spelling produces. */
  val Raw: Int = 1 << 24

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel (interpreted eval + generated code). */
  def bucket(key: UTF8String, mod: Int): Long = {
    require(mod > 0, s"md5_bucket modulus must be positive, got $mod")
    val md = digests.get()
    md.reset()
    val dig = md.digest(key.getBytes)
    val v = ((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) |
      (dig(2) & 0xffL)
    v % mod
  }
}
