package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite BAND joins — inner joins whose only
  * cross-side predicate is `abs(a - b) <= k` (or `< k`) on integral
  * columns — from the nested-loop plan Catalyst is forced into (no
  * equality key → BroadcastNestedLoopJoin, or a cartesian product when
  * neither side broadcasts: O(|L|·|R|)) into the bucketed equi-join
  * [[graft.operators.RangeJoin]] builds by hand:
  *
  *   - bucket width `w = k + 1` (so `|a - b| <= k` implies the buckets
  *     differ by at most one);
  *   - the left side tags each row with `floor(a / w)` (exact integer
  *     floor via the pmod-align identity — correct for negatives);
  *   - the right side explodes to its three candidate buckets
  *     `floor(b / w) + {-1, 0, 1}`;
  *   - hash-join on the bucket id, original band predicate kept as the
  *     residual filter.
  *
  * Every qualifying pair meets in EXACTLY one exploded bucket (the
  * left row's own), so no dedup is needed and results are identical
  * row-for-row. Cost: 3·|R| + |L| shuffle rows + residual checks —
  * the interval-join/as-of family's standard trick, applied
  * automatically to plans users write naively.
  *
  * Cost guard: when either side's size estimate is within the
  * auto-broadcast threshold, the nested-loop plan is a broadcast loop
  * over a small table — cheap and often better than adding a shuffle —
  * so the rewrite only fires when BOTH sides exceed the threshold
  * (always fires when broadcasting is disabled, threshold <= 0).
  * `spark.graft.bandJoinRewrite.force=true` overrides the guard and
  * rewrites every qualifying band join regardless of size estimates —
  * the deployment-posture pin for queries (r2) whose test-scale inputs
  * sit under the broadcast threshold but whose production inputs are
  * fact-fact; the rewrite stays correct at any size, the guard is only
  * a cost heuristic.
  *
  * Fires once per join: the rewritten join HAS a cross-side equality
  * (the bucket ids), which the applicability check excludes — the rule
  * is idempotent under the fixed-point optimizer batch. Registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`) and
  * available per-session through `spark.experimental.extraOptimizations`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** (leftExpr, rightExpr, slop) for a conjunct of shape
    * `abs(x - y) <= k` / `abs(x - y) < k` (either literal orientation),
    * with x from `left`'s output and y from `right`'s (either order). */
  private def bandConjunct(c: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    val parts = c match {
      case LessThanOrEqual(abs: Abs, l) => lit(l).map(k => (abs, k))
      case LessThan(abs: Abs, l) => lit(l).map(k => (abs, k - 1))
      case GreaterThanOrEqual(l, abs: Abs) => lit(l).map(k => (abs, k))
      case GreaterThan(l, abs: Abs) => lit(l).map(k => (abs, k - 1))
      case _ => None
    }
    parts.flatMap { case (abs, k) =>
      abs.child match {
        case Subtract(x, y, _)
          if k >= 0 && integral.contains(x.dataType) &&
            integral.contains(y.dataType) && x.deterministic && y.deterministic =>
          val (lo, ro) = (left.outputSet, right.outputSet)
          if (x.references.subsetOf(lo) && y.references.subsetOf(ro))
            Some((x, y, k))
          else if (x.references.subsetOf(ro) && y.references.subsetOf(lo))
            Some((y, x, k)) // abs is symmetric
          else None
        case _ => None
      }
    }
  }

  private def hasCrossEquality(conjuncts: Seq[Expression], left: LogicalPlan,
                               right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) => spansSides(a, b, left, right)
      case EqualNullSafe(a, b) => spansSides(a, b, left, right)
      case _ => false
    }

  private def spansSides(a: Expression, b: Expression, left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  /** Exact floor(x / w) on longs: align down with pmod, then divide. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val el = Cast(e, LongType)
    IntegralDivide(Subtract(el, Pmod(el, Literal(w))), Literal(w))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val forced = SQLConf.get
        .getConfString("spark.graft.bandJoinRewrite.force", "false").toBoolean
      val bothLarge = forced || threshold <= 0 ||
        (left.stats.sizeInBytes > threshold && right.stats.sizeInBytes > threshold)
      if (hasCrossEquality(conjuncts, left, right) || !bothLarge) j
      else conjuncts.view.flatMap(bandConjunct(_, left, right)).headOption match {
        case None => j
        case Some((lx, rx, k)) =>
          val w = k + 1
          val pbin = Alias(bucketOf(lx, w), "_graft_pbin")()
          val newLeft = Project(left.output :+ pbin, left)
          val rbin = bucketOf(rx, w)
          val one = Literal(1L)
          val candidates = CreateArray(Seq(
            Subtract(rbin, one), rbin, Add(rbin, one)))
          // bbin is declared non-nullable, so a nullable band column must
          // be filtered first or the declaration is a lie Catalyst may
          // compile into elided null checks. The filter is semantics-
          // preserving: a null band value can never satisfy abs(a-b) <= k
          // (the predicate evaluates to null → row dropped by the join).
          val prunedRight =
            if (rx.nullable) Filter(IsNotNull(rx), right) else right
          val bbin = AttributeReference("_graft_bbin", LongType,
            nullable = false)()
          val newRight = Generate(Explode(candidates),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bbin), child = prunedRight)
          val newCond = And(EqualTo(pbin.toAttribute, bbin), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
