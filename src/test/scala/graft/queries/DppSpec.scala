package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.SparkTestSession

/** q73's claim is the ANSWER (driver oracle); this spec pins the
  * MECHANISM: the quarter filter lives only on the dim side — and as
  * dim DATA, not an expression constraint propagation could rewrite —
  * yet the fact scan's partition filters carry a dynamic pruning
  * subquery (reusing the join's own broadcast) and the scan reads a
  * strict subset of the partition directories. This is the runtime
  * star-join skipping a 100 TB date-partitioned fact table lives on.
  */
class DppSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"

  /** FileSourceScanExecs under AQE wrappers (AdaptiveSparkPlanExec and
    * QueryStageExec hide their executed subplans from plain collect).
    */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  test("q73: dim-side quarter filter prunes fact partitions at runtime") {
    val df = graft.SparkEntry.queries("q73_dpp_star_join")(spark, D)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning#"),
      s"no dynamic pruning in the fact scan:\n${plan.take(4000)}")
    assert(plan.contains("SubqueryBroadcast dynamicpruning"),
      "the pruning subquery should reuse the join's broadcast " +
        s"(reuseBroadcastOnly):\n${plan.take(4000)}")

    val factScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.nonEmpty)
    assert(factScans.nonEmpty, "expected a partitioned fact scan")
    val scan = factScans.head
    // the quarter predicate must NOT have been rewritten into a static
    // partition filter on the fact — quarter is dim DATA, so runtime
    // pruning is the only mechanism (the point of the demo)
    val pf = scan.partitionFilters.map(_.toString)
    assert(pf.exists(_.contains("dynamicpruning")),
      s"no dynamic partition filter on the fact scan: $pf")
    assert(!pf.exists(_.contains("= 2")),
      s"quarter leaked into a static partition filter: $pf")

    val read = scan.metrics("numFiles").value
    val total = scan.relation.location.inputFiles.length.toLong
    assert(total >= 8, s"layout produced only $total files")
    assert(read < total, s"DPP pruned nothing: read $read of $total files")
    // a quarter is ~1/4 of the months; allow slack for uneven files
    assert(read.toDouble / total <= 0.5,
      s"pruning too weak for a quarter filter: $read of $total")
  }
}
