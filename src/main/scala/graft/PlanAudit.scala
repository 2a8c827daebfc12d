package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit main: prints key physical-plan facts for selected
  * queries so scan multiplicity, pushdown, and pruning regressions
  * are visible without wading through full explain dumps — and, as a
  * REGRESSION GATE, diffs them against a checked-in baseline.
  *
  * Usage:
  *   tools/run.sh graft.PlanAudit [queryName ...]   # print facts
  *   tools/run.sh graft.PlanAudit --write           # regenerate PLANS_BASELINE.json
  *   tools/run.sh graft.PlanAudit --check           # diff vs baseline, exit 1 on drift
  *
  * The baseline covers the BATCH registry; the 28 st* entries carry
  * their own STRUCTURAL baseline (stateful operator multiset +
  * exchange count per micro-batch shape) in STREAM_PLANS_BASELINE via
  * [[StreamPlanAudit]] — full plan equality is impossible there
  * (micro-batch plans vary by trigger), the stateful shape is not. A
  * plan count changing is not automatically a bug — an intentional
  * operator change regenerates the baseline in the same commit; an
  * UNINTENDED diff is exactly the silent regression (new shuffle, lost
  * broadcast, pruned column creeping back) this file exists to catch.
  */
object PlanAudit {

  private val BaselinePath = "PLANS_BASELINE.json"

  private case class Shape(scans: Int, cached: Int, exchanges: Int,
                           bhj: Int, smj: Int, pushed: Int) {
    def render: String =
      s"""{"scans":$scans,"cachedScans":$cached,"exchanges":$exchanges,"bhj":$bhj,"smj":$smj,"pushedFilterScans":$pushed}"""
  }

  private def shapeOf(spark: SparkSession, sfDir: String,
                      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Shape = {
    val df = fn(spark, sfDir)
    df.count() // let AQE finalize so the audited plan is the executed one
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def count(p: String) = p.r.findAllIn(plan).size
    Shape(
      scans = count("Scan parquet"),
      cached = count("InMemoryTableScan") + count("TableCacheQueryStage"),
      exchanges = count("Exchange"),
      bhj = count("BroadcastHashJoin"),
      smj = count("SortMergeJoin"),
      pushed = count("PushedFilters: \\[[^\\]]"))
  }

  private def parseBaseline(text: String): Map[String, String] =
    """"([a-z0-9_]+)":(\{[^}]*\})""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local("plan-audit", "8")
    graft.queries.Tables.validate(spark, sfDir)
    val queries = SparkEntry.queries ++ graft.queries.ReferenceQueries.benchOnly

    val mode = args.headOption match {
      case Some("--write") => "write"
      case Some("--check") => "check"
      case _ => "print"
    }
    val names =
      if (mode == "print" && args.nonEmpty) args.toSeq
      else queries.keys.toSeq.filterNot(_.startsWith("st")).sorted

    if (mode == "print") {
      names.foreach { name =>
        val s = shapeOf(spark, sfDir, queries(name))
        println(f"$name%-28s scans=${s.scans} cachedScans=${s.cached} " +
          f"exchanges=${s.exchanges} bhj=${s.bhj} smj=${s.smj} pushedFilterScans=${s.pushed}")
      }
    } else {
      val shapes = names.map(n => n -> shapeOf(spark, sfDir, queries(n)).render)
      if (mode == "write") {
        val json = shapes.map { case (k, v) => s""""$k":$v""" }
          .mkString("{\n", ",\n", "\n}\n")
        java.nio.file.Files.writeString(java.nio.file.Paths.get(BaselinePath), json)
        println(s"wrote ${shapes.size} plan shapes to $BaselinePath")
      } else {
        val base = parseBaseline(
          java.nio.file.Files.readString(java.nio.file.Paths.get(BaselinePath)))
        var drift = 0
        shapes.foreach { case (name, got) =>
          base.get(name) match {
            case None => println(s"NEW      $name $got (not in baseline)"); drift += 1
            case Some(want) if want != got =>
              println(s"DRIFT    $name\n  baseline: $want\n  current:  $got"); drift += 1
            case _ => ()
          }
        }
        base.keySet.diff(shapes.map(_._1).toSet).toSeq.sorted.foreach { gone =>
          println(s"REMOVED  $gone (in baseline, not in registry)"); drift += 1
        }
        val stCount = queries.keys.count(_.startsWith("st"))
        println(if (drift == 0)
          s"plan shapes match baseline (${shapes.size} of ${queries.size} registry entries; " +
            s"$stCount st* entries pinned structurally in STREAM_PLANS_BASELINE " +
            "via graft.StreamPlanAudit)"
        else s"$drift plan-shape drifts vs $BaselinePath")
        if (drift != 0) { spark.stop(); sys.exit(1) }
      }
    }
    spark.stop()
  }
}
