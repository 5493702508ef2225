package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.expressions.FastRoundDouble

/** Optimizer rule (round-12): rewrite `Round(double, literal s)` with
  * HALF_UP semantics into the codegen'd [[FastRoundDouble]] kernel.
  *
  * Why: Spark's RoundBase computes a DoubleType round through
  * `Double.toString` → string-parsed BigDecimal → setScale →
  * doubleValue PER ROW. The house determinism convention (SURVEY §2
  * D1–D5: round at a fixed scale before every cross-engine decimal
  * sum) makes this the hottest scalar in the suite — q_quantile_reg's
  * 80-point grid alone evaluates 48M of them at sf0.1. The kernel
  * decides the unambiguous cases arithmetically and falls back to the
  * exact reference computation inside the ambiguity band around
  * decimal ties (see [[graft.functions.FastRound]] for the error
  * analysis); FastRoundSpec pins bit-equality against Spark's own
  * Round over adversarial inputs, and the DuckDB oracle sweep
  * re-proves every graded value.
  *
  * The match is deliberately NARROW: DoubleType child, foldable
  * non-negative int literal scale ≤ 15 (10^s exactness bound), Round
  * only (HALF_UP — `bround`'s HALF_EVEN is not rewritten). Disable
  * with `spark.graft.fastround.rewrite=false`.
  */
object FastRoundRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.fastround.rewrite", "true") != "true") {
      plan
    } else plan.transformAllExpressions {
      case r: Round
          if r.child.dataType == DoubleType && r.child.resolved &&
            (r.scale match {
              case Literal(s: Int, IntegerType) =>
                s >= 0 && s <= graft.functions.FastRound.MaxScale
              case _ => false
            }) =>
        val Literal(s: Int, IntegerType) = r.scale: @unchecked
        FastRoundDouble(r.child, s)
    }
  }
}
