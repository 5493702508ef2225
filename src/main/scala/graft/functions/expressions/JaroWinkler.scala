package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity (SURVEY.md §4 optional row (a),
  * third custom expression): the fuzzy-match scorer Spark lacks as a
  * built-in (its string family stops at levenshtein/soundex), scored
  * here with the SAME semantics as DuckDB's
  * `jaro_winkler_similarity` so the operator is oracle-gradeable:
  *
  *  - either string empty → 0.0 (including both-empty — the
  *    Boost/DuckDB convention, probed 2026-08-13: `'' '' → 0.0`);
  *  - Jaro: matches within the ⌊max(|a|,|b|)/2⌋−1 window, greedy
  *    left-to-right pairing, transpositions = ⌊mismatched matched
  *    pairs / 2⌋ — FLOORED integer division, the rapidfuzz/DuckDB
  *    convention (probed: 'large rod'/'new rod' has 3 mismatched
  *    pairs → t=1 → 0.689947, where fractional t=1.5 would give
  *    0.656614);
  *  - Winkler boost only when jaro > 0.7 (probed: jaro 0.5 with a
  *    2-char common prefix stays 0.5), prefix capped at 4, p = 0.1.
  *
  * Codegen: the loop nest lives in a static method on the companion
  * ([[JaroWinkler.similarity]]); `doGenCode` emits a direct call to
  * it — the same pattern Spark's own `Levenshtein` uses (a static
  * kernel keeps whole-stage codegen tight without inlining 60 lines
  * of Java into every generated class).
  *
  * Unicode note: comparison is by UTF-16 code unit (Java `char`),
  * byte-identical to DuckDB's codepoint walk for all BMP text; the
  * fixture corpus is ASCII.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two string args, got ${left.dataType} and ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.expressions.JaroWinkler.similarity($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point. */
  def jw(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      JaroWinkler(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Static kernel, called from both interpreted eval and generated
    * code. Public + JVM-static so codegen can reference it. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk the matched chars of each side in order
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // floored half-transpositions (integer division) — see scaladoc
    val jaro = (m / n1 + m / n2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val cap = math.min(4, math.min(n1, n2))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
