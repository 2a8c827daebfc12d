package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit main: prints key physical-plan facts for selected
  * queries so scan multiplicity, pushdown, and pruning regressions
  * are visible without wading through full explain dumps.
  *
  * Usage: tools/run.sh graft.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local("plan-audit", "8")
    val queries = SparkEntry.queries ++ graft.queries.ReferenceQueries.benchOnly
    val names = if (args.nonEmpty) args.toSeq else queries.keys.toSeq.sorted

    names.foreach { name =>
      val df = queries(name)(spark, sfDir)
      df.count() // let AQE finalize so the audited plan is the executed one
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      def count(p: String) = p.r.findAllIn(plan).size
      val scans = count("Scan parquet")
      val cached = count("InMemoryTableScan") + count("TableCacheQueryStage")
      val exchanges = count("Exchange")
      val bhj = count("BroadcastHashJoin")
      val smj = count("SortMergeJoin")
      val pushed = count("PushedFilters: \\[[^\\]]")
      println(f"$name%-28s scans=$scans cachedScans=$cached exchanges=$exchanges " +
        f"bhj=$bhj smj=$smj pushedFilterScans=$pushed")
    }
    spark.stop()
  }
}
