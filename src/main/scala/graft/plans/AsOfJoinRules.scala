package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through the custom as-of join node. Catalyst's own
  * PushDownPredicates only understands built-in operators and leaves
  * unknown nodes alone — without this rule, `asof(l, r).filter(l.x > 3)`
  * would filter AFTER the join and the scan would read every left row.
  *
  * Legality: [[AsOfJoinPlan]] emits exactly one output row per left row
  * (left-outer, match or nulls), and every left attribute passes through
  * unchanged — so any deterministic predicate over left attributes
  * commutes with the join. Right-side / mixed predicates stay above
  * (they see join-produced nulls). Once pushed, the standard fixed-point
  * batch keeps pushing the filter down to the scan (PushedFilters).
  *
  * Registered by graft.core.GraftExtensions via `injectOptimizerRule` —
  * the third leg of the extension surface next to the injected
  * expression (parse_ipv4) and the planner strategy (AsOfJoinStrategy).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
