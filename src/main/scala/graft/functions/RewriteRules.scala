package graft.functions

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite `count(DISTINCT k)` over integral keys
  * into the native [[BitmapDistinct]] aggregate — an exact, semantics-
  * preserving PHYSICAL-strategy swap (bitmap OR over paged bitsets vs the
  * planner's two-phase distinct aggregation, whose first exchange carries
  * every distinct (group, k) pair). On dense surrogate-key domains the
  * bitmap's map-side combine ships ~1 bit per distinct key instead of a
  * row — the agg_bitmap_distinct operator run automatically for any query
  * that spells plain SQL `count(DISTINCT user_id)`.
  *
  * Scope guards, each load-bearing:
  * - integral child types only (the bitmap keys pages by value; int is
  *   widened with an explicit cast — analysis has already run, so the
  *   rule inserts what ImplicitCastInputTypes would have);
  * - `isDistinct` Count with exactly one argument (count(DISTINCT a, b)
  *   is multi-column semantics the bitmap does not model);
  * - batch plans only (the streaming agg state format is pinned by
  *   checkpoints — silently swapping the aggregate would corrupt them);
  * - multi-distinct aggregates have usually been expanded by
  *   RewriteDistinctAggregates before user rules run; the pattern then
  *   simply no longer matches and the plan is left untouched (documented
  *   fallback, not an error).
  * - disable per session with `spark.graft.bitmapDistinct.enabled=false`.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) and usable
  * ad hoc via `spark.experimental.extraOptimizations`.
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (plan.isStreaming ||
      conf.getConfString("spark.graft.bitmapDistinct.enabled", "true") != "true") plan
    else plan.transformUp {
      case agg: Aggregate => agg.transformExpressionsUp {
        case ae @ AggregateExpression(Count(children), _, true, _, _)
            if children.length == 1 &&
              (children.head.dataType == LongType ||
                children.head.dataType == IntegerType) =>
          val key =
            if (children.head.dataType == IntegerType)
              Cast(children.head, LongType)
            else children.head
          ae.copy(aggregateFunction = BitmapDistinct(key), isDistinct = false)
      }
    }
}
