package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Match direction for the native as-of join (merge_asof's
  * `direction`): backward = greatest rightTime <= leftTime, forward =
  * smallest rightTime >= leftTime, nearest = the closer of the two
  * (ties backward).
  */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

/** Logical backward as-of join: for each left row, the right row with
  * the greatest `rightTime <= leftTime` in the same key group, or nulls
  * (left-outer semantics). This is the whole-operator form of the brief's
  * extension tier (c) — a custom `LogicalPlan` + `SparkStrategy` +
  * physical `SparkPlan` registered through `SparkSessionExtensions` —
  * for an operator Spark's SQL surface genuinely lacks (DuckDB spells it
  * `ASOF LEFT JOIN`; pandas `merge_asof`). The composed equivalent
  * ([[graft.operators.AsOfJoin.backward]]) unions both sides through one
  * shuffle and runs a carry-forward window; this node lets the planner
  * produce [[AsOfJoinExec]] instead: co-partition + co-sort the sides
  * and do ONE streaming merge pass per partition — no union
  * materialization, no window state, and the sort on the (usually far
  * bigger) left side can be reused by the planner if the data is
  * already bucketed/sorted.
  *
  * Output: every left column, then the right time + payload columns
  * (nullable). Right KEY columns are dropped — they duplicate the left
  * keys by value on every matched row.
  *
  * Resolution: constructed from already-analyzed children with resolved
  * attributes, so the node is born resolved; the analyzer's
  * DeduplicateRelations still rewrites a conflicting (self-join) right
  * side like it does for built-in joins.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "asof: need at least one key and pairwise left/right keys")

  /** Right columns carried to the output: time + payload, not the keys. */
  def rightOutputCols: Seq[Attribute] = {
    val keyIds = rightKeys.map(_.exprId).toSet
    right.output.filterNot(a => keyIds.contains(a.exprId))
  }

  override def output: Seq[Attribute] =
    left.output ++ rightOutputCols.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
