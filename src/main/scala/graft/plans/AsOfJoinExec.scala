package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical as-of join (backward / forward / nearest, optional
  * tolerance): both sides hash-clustered on the keys and sorted by
  * (keys…, time) — EnsureRequirements inserts the exchanges/sorts
  * exactly as it does for a sort-merge join — then each co-located
  * partition pair is merged in ONE streaming pass.
  *
  * Per partition: walk the left rows in (key, time) order; advance the
  * right iterator past every row whose (key, time) is ≤ the current
  * left row, remembering the last one in the SAME key group — that row
  * is by construction the greatest `rightTime <= leftTime` match
  * (backward), while the un-consumed lookahead row is the smallest
  * `rightTime >= leftTime` (forward); nearest picks the closer of the
  * two, ties backward. Each right row is visited once per partition
  * (amortized O(|L| + |R|), no window state, no union), and only ONE
  * right row is buffered at a time, so memory is O(1) beyond the sort
  * — ALL directions ride the same single pass.
  *
  * Scale: the same two-exchange shape as a shuffle join; at 100 TB the
  * planner reuses bucketed/sorted layouts for either side the same way
  * it does for sort-merge joins, and AQE's coalescing still validates
  * our ClusteredDistribution requirement. Key groups never need to fit
  * in memory (unlike the composed window variant's per-partition sort
  * + carry state, this exec streams).
  *
  * Null semantics: keys compare null-safely (a null left key matches a
  * null right key) and times order nulls-first — identical to the
  * composed operator's window partitioning/ordering, and asserted
  * equivalent in AsOfJoinNativeSpec.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightOutputCols: Seq[Attribute],
    direction: AsOfDirection,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightOutputCols.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // one output row per left row, in left order — both properties pass
  // straight through (lets a parent reuse the (key, time) sort)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    val timeTypes = Seq(leftTime.dataType)
    val dir = direction
    val tol = tolerance
    // tolerance / nearest need time ARITHMETIC, not just ordering —
    // restricted to integral times (the builder enforces it)
    val timeIsLong = leftTime.dataType match {
      case org.apache.spark.sql.types.LongType => true
      case org.apache.spark.sql.types.IntegerType => false
      case t =>
        require(tol.isEmpty && dir != AsOfNearest,
          s"asof: tolerance/nearest need an integral time type, got $t")
        true
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      // interpreted total order over the projected key / time rows
      // (null-safe, nulls first — matching the child sort order)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(timeTypes)
      // binds by exprId: left attrs come from the left slot of the
      // JoinedRow, right payload attrs from the right slot. The right
      // slots MUST bind as nullable — an unmatched left row carries the
      // all-null row, and a non-nullable BoundReference would skip the
      // null check and read garbage instead
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      def timeOf(projected: InternalRow): Option[Long] =
        if (projected.isNullAt(0)) None
        else Some(if (timeIsLong) projected.getLong(0) else projected.getInt(0).toLong)

      new Iterator[InternalRow] {
        // the one-row lookahead of the right side, and the last right
        // row consumed (candidate match; key checked at emit time).
        // Iterator rows are buffer-reused upstream — copy on retain.
        private var rHead: InternalRow = _
        private var lastRight: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l) // valid until the next left row
          var advancing = true
          while (advancing) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next().copy()
            if (rHead == null) advancing = false
            else {
              val c = keyOrd.compare(rKeyProj(rHead), lk)
              if (c < 0) {
                rHead = null // key group already passed by the left side
              } else if (c == 0 && {
                  val tc = timeOrd.compare(rTimeProj(rHead), lTimeProj(l))
                  // forward keeps rt == lt as its own candidate (the
                  // lookahead); backward/nearest consume it
                  if (dir == AsOfForward) tc < 0 else tc <= 0
                }) {
                lastRight = rHead // newest right row at or before l's time
                rHead = null
              } else {
                advancing = false // right is ahead of l — stop here
              }
            }
          }
          // backward candidate: last consumed row, if it is l's key
          // group (and inside the tolerance window when one is set)
          def backCand: InternalRow =
            if (lastRight != null && keyOrd.compare(rKeyProj(lastRight), lk) == 0 &&
                tol.forall(t => (for {
                  lt <- timeOf(lTimeProj(l)); rt <- timeOf(rTimeProj(lastRight))
                } yield math.abs(lt - rt) <= t).getOrElse(false)))
              lastRight else null
          // forward candidate: the lookahead, if it is l's key group
          // (its time is >= l's by the advance loop's stop condition)
          def fwdCand: InternalRow =
            if (rHead != null && keyOrd.compare(rKeyProj(rHead), lk) == 0 &&
                tol.forall(t => (for {
                  lt <- timeOf(lTimeProj(l)); rt <- timeOf(rTimeProj(rHead))
                } yield math.abs(rt - lt) <= t).getOrElse(false)))
              rHead else null
          val m = dir match {
            case AsOfBackward => backCand
            case AsOfForward => fwdCand
            case AsOfNearest =>
              val b = backCand
              val f = fwdCand
              if (f == null) b
              else if (b == null) f
              else {
                // ties (including rt == lt, consumed backward) break
                // backward, matching merge_asof and the composed form;
                // a null-time backward candidate loses to a real
                // forward one (no finite distance)
                val choose = for {
                  lt <- timeOf(lTimeProj(l)); bt <- timeOf(rTimeProj(b))
                  ft <- timeOf(rTimeProj(f))
                } yield (lt - bt) <= (ft - lt)
                if (choose.getOrElse(false)) b else f
              }
          }
          outProj(joined(l, if (m == null) nullRight else m))
        }
      }
    }
  }
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Registered by
  * graft.core.GraftExtensions via `injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      require(j.left.outputSet.intersect(j.right.outputSet).isEmpty,
        "asof: left and right share attributes (self-join) — alias one side first")
      AsOfJoinExec(
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightOutputCols, j.direction, j.tolerance,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
