package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The executed physical plan of every graded query, built ONCE per
  * test JVM and shared by all whole-surface plan gates
  * ([[GlobalJoinSpec]], [[GlobalWindowSpec]], [[GlobalFunnelSpec]]).
  * Each suite previously built its own copy of all 536 plans (~2 min
  * per pass); `Test / fork := true` runs every suite in one JVM, so a
  * single shared pass serves them all.
  *
  * A query that fails to BUILD here throws, which fails whichever
  * gate suite touches the list first — same net effect as the old
  * per-suite `fail(...)`, still build-failing.
  */
object GradedPlans {

  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Fixture columns whose domain is bounded by a small constant at
    * ANY scale factor (TPC-H spec constants / TESTDATA generators),
    * including the aliases graded queries give them. Shared by every
    * gate that reasons about per-key funnels: a partition spec, join
    * key set, or sort key set containing at least one column NOT in
    * this set is assumed scale-parallel and skipped.
    * (ScaleProbe in main mirrors this list — keep in sync.) */
  val lowCardNames: Set[String] = Set(
    "event_type", "o_orderpriority", "pri", "lang", "l_returnflag",
    "l_linestatus", "o_orderstatus", "c_mktsegment", "source", "split",
    "flag", "grp", "arm", "cohort", "band", "is_weekend", "label",
    // TPC-H spec constants: 25 nations, 5 regions, 25 brands, 5
    // segments — a 25-way funnel is still a funnel at 100 TB
    "n_name", "n_nationkey", "r_name", "r_regionkey", "p_brand",
    "brand", "p_mfgr", "nation", "region", "mktsegment", "seg",
    "status", "p_container", "shipmode", "l_shipmode",
    // round-6 continuation promotion (round-7 shelf item executed):
    // the graded queries' constant-domain aliases — event_type as
    // t/a/b, calendar day/dow/wk, embedding dim pos, fixed grids —
    // are funnels too when they key a window/join over uncontracted
    // facts. The promotion sweep caught exactly one genuine offender
    // the original name set had missed (q_rank_corr's rank() windows
    // partitioned by `t` alone — rewritten onto the grid midranks,
    // hash-identical); everything else was already clean
    "t", "a", "b", "pos", "cluster", "lab", "bin", "decile", "dose",
    "era", "wk", "dow", "wd", "day", "week", "lang_p")

  /** True when every row reaching this subtree's output passed
    * through a row-contracting operator (aggregate, limit, rank
    * limit) or comes from a constant-size source — i.e. an operator
    * above it does NOT see raw fact-scale rows. Joins/unions stay
    * contracted only if ALL inputs are. Conservative in the right
    * direction for a gate: an unrecognized leaf is uncontracted
    * (including the RDD-scan leaves that lazy localCheckpoint plants —
    * a checkpointed frame needs a documented allowlist bound). */
  def contractedBelow(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec |
         _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      val path = f.relation.location.rootPaths.mkString(",")
      path.contains("nation") || path.contains("region")
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= BigInt(65536)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      contractedBelow(j.left) && contractedBelow(j.right)
    case u: org.apache.spark.sql.execution.UnionExec =>
      u.children.forall(contractedBelow)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      contractedBelow(r.child)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(contractedBelow)
  }

  private lazy val executions
      : Seq[(String, org.apache.spark.sql.execution.QueryExecution)] = {
    val spark = GraftSpecBase.session
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          throw new AssertionError(
            s"$name failed to build at $sf: ${e.getMessage}", e) }
      name -> df.queryExecution
    }
  }

  lazy val atSf0001: Seq[(String, SparkPlan)] =
    executions.map { case (n, qe) => n -> strip(qe.executedPlan) }

  /** Optimized LOGICAL plans from the same build pass — join hints
    * survive here (the physical plan no longer says which broadcasts
    * were hint-forced vs stats-chosen). */
  lazy val logicalAtSf0001
      : Seq[(String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    executions.map { case (n, qe) => n -> qe.optimizedPlan }

  /** Column names whose cardinality GROWS with the corpus/SF (vocab
    * tokens, document/user/part identities): a per-one-of-these map is
    * the frame class that must never be hint-force-broadcast — at
    * 100 TB it is GBs while a hint pins the broadcast strategy at
    * every scale. */
  val growingNames: Set[String] = Set(
    "tok", "token", "term", "doc_id", "user_id", "u", "node",
    "l_partkey", "p_partkey", "o_custkey", "c_custkey",
    "o_orderkey", "l_orderkey", "event_id", "vec_id")

  /** Constant-domain alias names accepted by [[boundedLogical]]'s
    * Aggregate rule IN ADDITION to [[lowCardNames]] — aliases the
    * graded queries consistently give bounded domains. Scoped to the
    * logical bound only (NOT the window/join funnel gates, whose
    * lowCardNames widening is a separate decision per gate):
    *  - t / a / b: event_type and its transition-pair aliases
    *    (Markov/entropy frames) and nation-graph endpoints — both
    *    constant domains;
    *  - pos: embedding dimension index (schema constant ≤ 64);
    *  - cluster / lab / bin / decile / dose / era / band: fixed
    *    evaluation grids (k clusters, 10 bins/deciles, 5 doses …);
    *  - wk / dow / wd / day / week: calendar-bounded;
    *  - mask: the 2^4 coalition bitmask domain;
    *  - b0-b2 / p0-p2: sketch bucket indices (CMS width 1024, bloom
    *    m = 4096 — compile-time constants). */
  val boundedAliasNames: Set[String] = Set(
    "t", "a", "b", "pos", "cluster", "lab", "bin", "decile", "dose",
    "era", "wk", "dow", "wd", "day", "week", "mask",
    // lang_p: the language alias in q_lang_id/q_lang_kappa's profile
    // frames (|langs| domain) — lets the rank-limited-window rule
    // prove the top-5-per-language fetch bounded
    "lang_p",
    "b0", "b1", "b2", "p0", "p1", "p2")

  /** Logical row bound: true when the subtree provably emits rows
    * bounded by a small constant independent of input size. Extends
    * the physical proofs with the literal-predicate rule: an
    * Aggregate grouping on a column that a Filter below pins to a
    * literal set (`isin` / `===`) is bounded by that set, whatever
    * the layers between contribute (the q_bm25 2-literal-term df
    * frame). Conservative otherwise: unrecognized leaf = unbounded. */
  def boundedLogical(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, In, InSet, Literal}
    def literallyBounded(a: Attribute, below: LogicalPlan): Boolean =
      below.collect { case f: Filter => f.condition }.exists { cond =>
        cond.exists {
          case In(att: Attribute, vs) =>
            att.exprId == a.exprId && vs.forall(_.isInstanceOf[Literal])
          case InSet(att: Attribute, _) => att.exprId == a.exprId
          case EqualTo(att: Attribute, _: Literal) => att.exprId == a.exprId
          case EqualTo(_: Literal, att: Attribute) => att.exprId == a.exprId
          case _ => false
        }
      }
    // the fixture tables' unique row keys (TESTDATA contract): an
    // equality pin on one is a 1-row fetch; a `< k` range is ≤ k rows
    val fixturePks = Set("vec_id", "doc_id", "event_id")
    def pkBounded(cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      cond.exists {
        case EqualTo(att: Attribute, _: Literal) => fixturePks(att.name)
        case EqualTo(_: Literal, att: Attribute) => fixturePks(att.name)
        case org.apache.spark.sql.catalyst.expressions.LessThan(
          att: Attribute, Literal(v: Long, _)) =>
          fixturePks(att.name) && v <= 65536L
        case org.apache.spark.sql.catalyst.expressions.LessThan(
          att: Attribute, Literal(v: Int, _)) =>
          fixturePks(att.name) && v <= 65536
        case _ => false
      }
    // a filter comparing a row_number()/rank() window column to a
    // small literal, where the window's partition keys are all
    // bounded domains, caps rows at k·|partitions| (the top-k-per-
    // group shape: q_lang_id's top-5 profile, q_tail_index's rn=50)
    def rankLimited(f: Filter): Boolean = {
      import org.apache.spark.sql.catalyst.expressions._
      val rankAttrs: Set[ExprId] = f.child.collect {
        case w: Window if w.partitionSpec.forall {
            case att: Attribute =>
              lowCardNames.contains(att.name) ||
                boundedAliasNames.contains(att.name)
            case _ => false
          } =>
          w.windowExpressions.collect {
            case al: Alias if al.child.exists {
                case we: WindowExpression =>
                  we.windowFunction.isInstanceOf[RowNumber] ||
                    we.windowFunction.isInstanceOf[Rank]
                case _ => false
              } => al.exprId
          }
      }.flatten.toSet
      def small(l: Literal): Boolean = l.value match {
        case v: Int => v <= 65536
        case v: Long => v <= 65536L
        case _ => false
      }
      rankAttrs.nonEmpty && f.condition.exists {
        case EqualTo(att: Attribute, l: Literal) =>
          rankAttrs(att.exprId) && small(l)
        case LessThanOrEqual(att: Attribute, l: Literal) =>
          rankAttrs(att.exprId) && small(l)
        case org.apache.spark.sql.catalyst.expressions.LessThan(
          att: Attribute, l: Literal) => rankAttrs(att.exprId) && small(l)
        case _ => false
      }
    }
    p match {
      case f: Filter if pkBounded(f.condition) || rankLimited(f) => true
      case a: Aggregate =>
        a.groupingExpressions.isEmpty || boundedLogical(a.child) ||
          a.groupingExpressions.forall { g =>
            // a computed grouping key carries its user-facing name in
            // the aggregate list's Alias, not in the grouping
            // expression (the optimizer may even hoist the expression
            // into the child and group on an attribute literally
            // named `_groupingexpression`) — collect every name the
            // key answers to and accept if ANY is a bounded domain
            val direct = g match {
              case att: Attribute => Seq(att.name)
              case al: org.apache.spark.sql.catalyst.expressions.Alias =>
                Seq(al.name)
              case _ => Nil
            }
            val aliased = a.aggregateExpressions.collect {
              case al: org.apache.spark.sql.catalyst.expressions.Alias
                if al.child.semanticEquals(g) => al.name
            }
            val names = direct ++ aliased
            names.exists(name =>
              lowCardNames.contains(name) ||
                boundedAliasNames.contains(name) ||
                // PrefixOps internals: partition-column copies are
                // low-cardinality by the operator's documented
                // contract; bucket keys are compile-time constants
                name.startsWith("__pfx_p") ||
                Set("__pfx_bucket", "__tb", "__eb").contains(name)) ||
              (g match {
                case att: Attribute => literallyBounded(att, a.child)
                case _ => false
              })
          }
      case _: GlobalLimit | _: LocalLimit => true
      case _: OneRowRelation => true
      case l: LocalRelation => l.data.size <= 65536
      case r: Range => r.numElements <= BigInt(65536)
      case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val path = rel.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
        path.contains("nation") || path.contains("region")
      case j: Join => boundedLogical(j.left) && boundedLogical(j.right)
      case u: Union => u.children.forall(boundedLogical)
      case g: Generate => boundedLogical(g.child)
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(boundedLogical)
    }
  }
}
