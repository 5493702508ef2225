package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.FloatVecDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot(a, b)")` works cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.register]], which performs the same
  * registrations against the live function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // custom whole-operator plans (SURVEY.md §4): as-of join exec +
    // the filter-pushdown rule Catalyst can't derive for custom nodes
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinFilterPushdown)
    ext.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DerivedPartitionPruning)
    ext.injectOptimizerRule(_ => graft.plans.FastRoundRewrite)
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two array<float> args")
        FloatVecDot(args.head, args(1))
      }),
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.KmvDistinct].getName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_distinct(expr, k) takes 2 args")
        graft.functions.expressions.KmvDistinct(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier("ngram_shingles"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.NGramShingles].getName,
        "ngram_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_shingles(text, n) takes 2 args")
        graft.functions.expressions.NGramShingles(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.JaroWinkler].getName,
        "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b) takes two string args")
        graft.functions.expressions.JaroWinkler(args.head, args(1))
      }),
    (FunctionIdentifier("md5_bucket"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.Md5Bucket].getName,
        "md5_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "md5_bucket(key, m) takes 2 args")
        graft.functions.expressions.Md5Bucket(args.head, args(1))
      }),
    (FunctionIdentifier("space_tokens"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.SpaceTokens].getName,
        "space_tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "space_tokens(s) takes 1 arg")
        graft.functions.expressions.SpaceTokens(args.head)
      }),
    (FunctionIdentifier("top_k_struct"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.TopKStruct].getName,
        "top_k_struct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_k_struct(s, k) takes 2 args")
        val k = args(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"top_k_struct k must be a foldable int literal, got $other")
        }
        graft.functions.expressions.TopKStruct(args.head, k)
      }),
    (FunctionIdentifier("hist_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.HistFixed].getName,
        "hist_fixed"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "hist_fixed(x, lo, hi, bins) takes 4 args")
        def dbl(e: Expression, what: String): Double = e match {
          case f if f.foldable =>
            f.eval() match {
              case d: java.lang.Double => d
              case n: Number => n.doubleValue()
              case other => throw new IllegalArgumentException(
                s"hist_fixed $what must be numeric, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"hist_fixed $what must be a foldable literal, got $other")
        }
        val bins = args(3) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"hist_fixed bins must be a foldable int literal, got $other")
        }
        graft.functions.expressions.HistFixed(args.head,
          dbl(args(1), "lo"), dbl(args(2), "hi"), bins)
      }),
    (FunctionIdentifier("bitset_distinct"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.BitsetDistinct].getName,
        "bitset_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bitset_distinct(k, maxId) takes 2 args")
        // Evaluate the foldable once and null-check: CAST(NULL AS INT)
        // is foldable with IntegerType but evals to null — fall through
        // to the same IllegalArgumentException, not an NPE.
        val maxId = (args(1) match {
          case e if e.foldable && (e.dataType ==
              org.apache.spark.sql.types.IntegerType || e.dataType ==
              org.apache.spark.sql.types.LongType) =>
            Option(e.eval()).map(_.asInstanceOf[Number].longValue())
          case _ => None
        }).getOrElse(throw new IllegalArgumentException(
          "bitset_distinct maxId must be a non-null foldable integer " +
            s"literal, got ${args(1)}"))
        graft.functions.expressions.BitsetDistinct(args.head, maxId)
      }))

  /** Register the custom functions and planner strategies into a
    * live session (tests/notebooks, where `spark.sql.extensions` was
    * not set at build time). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraStrategies.contains(graft.plans.RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.RangeJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RangeJoinFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinFilterPushdown
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.AsOfJoinFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AsOfJoinFilterPushdown
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.VecDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.VecDotRewrite
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinBandRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinBandRewrite
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.DerivedPartitionPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DerivedPartitionPruning
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.FastRoundRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FastRoundRewrite
  }
}
