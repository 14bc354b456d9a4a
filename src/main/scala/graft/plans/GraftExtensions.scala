package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** The engine's `SparkSessionExtensions` hook (SURVEY §7.3): what a
  * deployment passes to `SparkSession.builder().withExtensions(...)`
  * (or `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Registers:
  *  - `bounded_sorted_list(expr, k)` as a SQL function, so the O(k)
  *    top-k aggregate ([[BoundedSortedList]]) is reachable from
  *    `spark.sql` queries, not only the Scala API;
  *  - [[RewriteBoundedTopK]], an optimizer rule rewriting the naive
  *    `slice(array_sort(collect_list(x)), 1, k)` phrasing — the shape
  *    users actually write — into the same aggregate, turning an
  *    unbounded-state plan into a bounded-state one without a code
  *    change on the caller's side;
  *  - [[RewriteWindowAggToJoin]], an optimizer rule rewriting
  *    order-independent whole-partition window aggregates
  *    (`min/max/sum/count/avg(x) OVER (PARTITION BY k)`) into a
  *    map-side-combinable group-by joined back — the skew-safe shape
  *    this repo's dedup surfaces use by hand, applied by the engine
  *    to any query (opt out:
  *    `spark.graft.rewrite.windowAggToJoin=false`);
  *  - [[RewriteKeeperElection]], an optimizer rule rewriting keeper
  *    election — `row_number() OVER (PARTITION BY k ORDER BY o) = 1`,
  *    filtered (keep best per group → one min_by aggregate) or
  *    labeled (mark best per group → min(struct) + join back) — into
  *    hot-key-safe aggregate shapes (opt out:
  *    `spark.graft.rewrite.keeperElection=false`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.boundedSortedListFunction)
    ext.injectOptimizerRule(_ => RewriteBoundedTopK)
    ext.injectOptimizerRule(_ => RewriteWindowAggToJoin)
    ext.injectOptimizerRule(_ => RewriteKeeperElection)
  }
}

object GraftExtensions {
  /** `bounded_sorted_list(expr, k)` — k must be a positive int literal
    * (it sizes the aggregation buffer, so it cannot be data-dependent).
    * The analyzer wraps the returned AggregateFunction in a Complete
    * AggregateExpression like any registered aggregate. */
  val boundedSortedListFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bounded_sorted_list"),
    new ExpressionInfo(classOf[BoundedSortedList].getName,
      "bounded_sorted_list"),
    (args: Seq[Expression]) => args match {
      case Seq(c, Literal(k: Int, IntegerType)) if k > 0 =>
        BoundedSortedList(c, k)
      case _ => throw new IllegalArgumentException(
        "usage: bounded_sorted_list(expr, k) with k a positive INT literal")
    })
}

/** `slice(array_sort(collect_list(x)), 1, k)` holds every row of the
  * group in the collect_list buffer before sorting and truncating; the
  * same value is the k smallest elements of the group, computable with
  * O(k) state per task ([[BoundedSortedList]]). This rule does that
  * substitution inside Aggregate nodes when the array_sort comparator
  * is the default (a custom comparator changes which k elements
  * survive, so those are left alone), the slice starts at 1, and the
  * length is a positive int literal.
  *
  * Runs in the operator-optimization batch (fixed point), so a
  * `.agg(collect_list).select(slice(array_sort(...)))` phrasing matches
  * too once CollapseProject folds the projection into the Aggregate. */
object RewriteBoundedTopK extends Rule[LogicalPlan] {

  /** True iff `f` is array_sort's default comparator bound to `f`'s own
    * lambda arguments (ArraySort.defaultComparator post-analysis):
    * null-last, then ascending by <. Matching by semanticEquals against
    * a template built from the SAME argument instances survives
    * exprId/cosmetic differences. */
  private def isDefaultComparator(f: LambdaFunction): Boolean =
    f.arguments match {
      case Seq(l, r) =>
        val ascending =
          If(LessThan(l, r), Literal(-1),
            If(GreaterThan(l, r), Literal(1), Literal(0)))
        // collect_list emits no nulls, so by the time this rule sees the
        // plan, constant folding has usually stripped the null branches
        // down to the bare ascending compare — accept both forms
        val full =
          If(And(IsNull(l), IsNull(r)), Literal(0),
            If(IsNull(l), Literal(1),
              If(IsNull(r), Literal(-1), ascending)))
        f.function.semanticEquals(ascending) || f.function.semanticEquals(full)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate => agg.transformExpressions {
      case Slice(
          ArraySort(
            ae @ AggregateExpression(CollectList(child, _, _), _, false, _, _),
            cmp: LambdaFunction, _),
          Literal(1, IntegerType), Literal(k: Int, IntegerType))
          if k > 0 && isDefaultComparator(cmp) =>
        ae.copy(aggregateFunction = BoundedSortedList(child, k))
    }
  }
}
