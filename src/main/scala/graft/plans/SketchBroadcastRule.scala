package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, ExistenceJoin, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.operators.SketchStats

/** Sketch-driven join planning: inject a broadcast hint on a join
  * side whose POST-FILTER size the persisted Count-Min stats bound
  * under the registered threshold — the estimate Spark's size-only
  * stats cannot make (a filtered scan keeps the whole file's size,
  * so a selectively-filtered dimension that shrank to broadcast
  * range is still sort-merge-joined, and at 100 TB that is a full
  * fact-table exchange the hint removes).
  *
  * Safety comes from the sketch's direction of error: Count-Min
  * point queries over-count (collisions only add), so the rule only
  * ever broadcasts something SMALLER than its evidence. Shape:
  *   - only sides that are a Project/Filter chain over a path-read
  *     relation with registered stats ([[SketchStats]]); streaming
  *     sides never match (their leaves aren't file relations).
  *   - only equality/IN predicates on the registered column
  *     contribute; conjuncts take the min bound (AND can only
  *     shrink), IN sums its members' bounds.
  *   - an unfiltered registered table never fires — full-table
  *     sizing is exactly what static stats already do well.
  *   - existing per-side strategy hints win; the rule is a no-op on
  *     them and on every plan while the registry is empty, and
  *     writes the Join's hint field directly (no ResolvedHint
  *     lifecycle), so re-running to fixpoint is idempotent.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions), so it also arrives via
  * `spark.sql.extensions=graft.core.GraftExtensions` on a cluster
  * submit. SketchBroadcastSpec pins the SMJ→BHJ flip with static
  * auto-broadcast disabled, the answer equality, and the threshold
  * guard; q68 runs the whole lifecycle under the DuckDB oracle.
  */
object SketchBroadcastRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SketchStats.isEmpty) plan
    else plan.transformUp {
      case j @ Join(left, right, joinType, _, hint)
          if hint.leftHint.forall(_.strategy.isEmpty) &&
            hint.rightHint.forall(_.strategy.isEmpty) =>
        val lBytes = if (canBuildLeft(joinType)) estimateBytes(left) else None
        val rBytes = if (canBuildRight(joinType)) estimateBytes(right) else None
        (lBytes, rBytes) match {
          case (Some(lb), rb) if rb.forall(lb <= _) =>
            j.copy(hint = hint.copy(leftHint =
              Some(hint.leftHint.getOrElse(HintInfo()).copy(strategy = Some(BROADCAST)))))
          case (_, Some(_)) =>
            j.copy(hint = hint.copy(rightHint =
              Some(hint.rightHint.getOrElse(HintInfo()).copy(strategy = Some(BROADCAST)))))
          case _ => j
        }
    }

  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case Inner | Cross | RightOuter => true
    case _ => false
  }

  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
    case _ => false
  }

  /** The sketch-bounded size of this side in bytes, when (a) it is a
    * Project/Filter chain over a stats-registered file relation, (b)
    * at least one equality/IN predicate on the registered column
    * exists, and (c) the bound lands under the registration's
    * threshold. None otherwise — None means "no evidence", never
    * "evidence of big".
    */
  private def estimateBytes(side: LogicalPlan): Option[Long] = {
    val (leaf, preds) = strip(side, Nil)
    val path = leaf match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(p => SketchStats.canonPath(p.toString))
        case _ => None
      }
      case _ => None
    }
    path.flatMap { p =>
      // exprId check (ADVICE r10): the predicate's attribute must be
      // the LEAF RELATION's own output, not merely name-equal — strip
      // rewrote predicates through Project alias maps, so an alias of
      // a different expression to the registered name either resolved
      // to a non-attribute (no bound) or to the true underlying column
      val bounds = preds.flatMap(boundOf(p, _, leaf.outputSet))
      if (bounds.isEmpty) None
      else {
        val (rows, st) = bounds.minBy(_._1)
        val bytes = rows * st.avgRowBytes
        if (bytes <= st.thresholdBytes) Some(bytes) else None
      }
    }
  }

  @tailrec
  private def strip(p: LogicalPlan,
                    preds: List[Expression]): (LogicalPlan, List[Expression]) =
    p match {
      case Filter(c, child) => strip(child, splitConjunctivePredicates(c) ++: preds)
      case proj @ Project(_, child) =>
        // resolve aliases so a predicate on a RENAMED column reaches
        // the leaf as the true underlying expression (ADVICE r10: a
        // Project aliasing a DIFFERENT expression to the registered
        // name must not borrow that column's distribution — after
        // substitution such a predicate is no longer a bare attribute
        // and boundOf yields no bound)
        val aliases = getAliasMap(proj)
        strip(child, preds.map(replaceAlias(_, aliases)))
      case other => (other, preds)
    }

  /** The row bound one predicate yields against `path`'s registered
    * stats, with the registration it came from. `leafOutput` is the
    * leaf relation's output set: only an attribute the RELATION
    * itself produces may borrow its registered distribution.
    */
  private def boundOf(path: String, pred: Expression,
                      leafOutput: org.apache.spark.sql.catalyst.expressions.AttributeSet): Option[(Long, SketchStats.ColumnStats)] = {
    def est(a: AttributeReference, lits: Seq[Literal]): Option[(Long, SketchStats.ColumnStats)] =
      for {
        _ <- if (leafOutput.contains(a)) Some(()) else None
        st <- SketchStats.lookup(path, a.name)
        values <- traverse(lits.map(litString))
        rows <- SketchStats.estimateRows(path, a.name, values)
      } yield (rows, st)
    pred match {
      case EqualTo(a: AttributeReference, l: Literal) => est(a, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) => est(a, Seq(l))
      case EqualNullSafe(a: AttributeReference, l: Literal) => est(a, Seq(l))
      case EqualNullSafe(l: Literal, a: AttributeReference) => est(a, Seq(l))
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        est(a, list.map(_.asInstanceOf[Literal]))
      case _ => None
    }
  }

  /** The value string the build hashed: Spark's cast-to-string of the
    * column value. Restricted to types whose literal toString IS that
    * cast (strings and integral numerics) — anything else (dates,
    * decimals, floats with format subtleties) yields None and simply
    * contributes no bound.
    */
  private def litString(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v, StringType) => Some(v.toString)
    case (v, IntegerType | LongType | ShortType | ByteType) => Some(v.toString)
    case _ => None
  }

  private def traverse(xs: Seq[Option[String]]): Option[Seq[String]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
