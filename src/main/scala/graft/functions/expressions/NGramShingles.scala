package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst Generator producing word n-gram shingles from a token
  * array: one output row per shingle, tokens joined with '_'.
  *
  * This is the custom-Generator capability row of SURVEY.md §2-B /
  * §7.3. The declarative twin used by the graded queries
  * (`explode(zip_with(slice(...), slice(...), concat))`, DedupQueries
  * #61) covers n=2; this Generator generalizes to any n with a single
  * pass and no intermediate array-of-arrays, the shape a shingling
  * stage needs when feeding MinHash at 100 TB (shingles stream out of
  * the generator into the hash aggregation without materializing per-
  * doc shingle arrays).
  *
  * Generators cannot participate in whole-stage codegen in the same
  * way scalar expressions do (GenerateExec drives them row-by-row),
  * so CodegenFallback costs nothing here.
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def position: Boolean = false
  override def inline: Boolean = false

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NGramShingles needs array<string>, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val tokens = arr.asInstanceOf[ArrayData]
    val m = tokens.numElements()
    if (m < n) return Nil
    val sep = UTF8String.fromString("_")
    // windows containing a null token are skipped (the schema declares
    // shingle non-nullable; emitting a null row would poison codegen'd
    // consumers that trust it)
    (0 to m - n).iterator.flatMap { i =>
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      var hasNull = false
      while (j < n) {
        val t = if (tokens.isNullAt(i + j)) { hasNull = true; null }
                else tokens.getUTF8String(i + j)
        parts(2 * j) = t
        if (j < n - 1) parts(2 * j + 1) = sep
        j += 1
      }
      if (hasNull) Iterator.empty
      else Iterator(InternalRow(UTF8String.concat(parts: _*)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object NGramShingles {
  /** Column-API entry: one row per n-gram of the token array. */
  def shingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.toColumn(
      NGramShingles(GraftSqlBridge.toExpression(tokens), n))
}
