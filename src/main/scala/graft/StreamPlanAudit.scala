package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** Streaming plan-shape gate (VERDICT r11 ask #2): the batch
  * registry's plan shapes are pinned in PLANS_BASELINE.json, but the
  * 28 st* entries were excluded wholesale — full micro-batch plan
  * equality is impossible (plans vary by trigger), yet the STRUCTURAL
  * invariants are stable per entry: WHICH stateful operator classes
  * appear and HOW MANY shuffles each stateful micro-batch plan
  * carries. A silent regression from one stateful exchange to two, or
  * a dedup that quietly became a full aggregation, passes a
  * rows-equality gate; it cannot pass this one.
  *
  * Capture: every micro-batch execution posts a
  * SparkListenerSQLExecutionStart carrying its physical SparkPlanInfo
  * tree. While one st entry runs (each drives its streams to
  * completion internally), a listener collects every plan containing
  * a stateful operator — state-store saves/restores, streaming joins,
  * dedup, (flat)MapGroupsWithState, transformWithState, session
  * windows — and summarizes it as the multiset of stateful node names
  * plus the plan's exchange count. The entry's signature is the SET
  * of distinct summaries (successive micro-batches of one query share
  * a shape; an entry with a maintenance stream contributes a second
  * shape; batch fixture queries carry no stateful node and drop out).
  *
  * Usage mirrors PlanAudit:
  *   tools/run.sh graft.StreamPlanAudit [st_name ...]  # print
  *   tools/run.sh graft.StreamPlanAudit --write        # regenerate baseline
  *   tools/run.sh graft.StreamPlanAudit --check        # exit 1 on drift
  */
object StreamPlanAudit {

  private val BaselinePath = "STREAM_PLANS_BASELINE.json"

  private def statefulOps(info: SparkPlanInfo): Seq[String] = {
    val here =
      if (info.nodeName.contains("State") || info.nodeName.startsWith("Streaming"))
        Seq(info.nodeName)
      else Nil
    here ++ info.children.flatMap(statefulOps)
  }

  private def exchanges(info: SparkPlanInfo): Int =
    (if (info.nodeName == "Exchange") 1 else 0) +
      info.children.map(exchanges).sum

  /** One stateful micro-batch plan → its structural summary; None for
    * stateless plans (batch fixtures, stateless streams).
    */
  private def summarize(info: SparkPlanInfo): Option[String] = {
    val ops = statefulOps(info)
    if (ops.isEmpty) None
    else Some(ops.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (n, g) => s"$n*${g.size}" }
      .mkString("ops=", ",", s";exchanges=${exchanges(info)}"))
  }

  /** Collects stateful-plan summaries from the listener bus. The bus
    * is asynchronous, so consumers wait for [[stable]] before reading.
    */
  private final class Collector extends SparkListener {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
      case e: SparkListenerSQLExecutionStart =>
        summarize(e.sparkPlanInfo).foreach(seen.add)
      case _ => ()
    }
    /** Wait until no new plan has arrived for `quietMs` (the entry has
      * already run to completion synchronously; this only drains the
      * async bus). The bus can pause longer than one quiet window
      * between slow micro-batch postings, so a still-arriving stream
      * of events EXTENDS the wait up to `maxMs` — and hitting `maxMs`
      * while events are still arriving FAILS LOUDLY instead of
      * returning silently: a silent return let late plans bleed into
      * the NEXT entry's signature and produced flaky drift failures in
      * gate's --check (ADVICE r12).
      */
    def stable(quietMs: Long = 400L, maxMs: Long = 30000L): Unit = {
      val deadline = System.nanoTime() + maxMs * 1000000L
      var last = seen.size()
      while (true) {
        Thread.sleep(quietMs)
        val n = seen.size()
        if (n == last) return
        if (System.nanoTime() >= deadline)
          throw new IllegalStateException(
            s"stream plan bus still posting after ${maxMs} ms " +
              s"($n plans so far) — entry attribution would be wrong; " +
              "raise maxMs or investigate the runaway stream")
        last = n
      }
    }
    def drain(): Seq[String] = {
      val out = Seq.newBuilder[String]
      var s = seen.poll()
      while (s != null) { out += s; s = seen.poll() }
      out.result()
    }
  }

  private def render(summaries: Seq[String]): String =
    summaries.distinct.sorted.map(s => s""""$s"""").mkString("[", ",", "]")

  private def parseBaseline(text: String): Map[String, String] =
    """"(st[a-z0-9_]+)":(\[[^\]]*\])""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local("stream-plan-audit", "8")
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.validate(spark, sfDir)
    val queries = SparkEntry.queries

    val mode = args.headOption match {
      case Some("--write") => "write"
      case Some("--check") => "check"
      case _ => "print"
    }
    val names =
      if (mode == "print" && args.nonEmpty) args.toSeq
      else queries.keys.toSeq.filter(_.startsWith("st")).sorted

    val collector = new Collector
    spark.sparkContext.addSparkListener(collector)

    val sigs: Seq[(String, String)] = names.map { name =>
      collector.stable(); collector.drain() // flush the previous entry
      queries(name)(spark, sfDir).collect()
      collector.stable()
      name -> render(collector.drain())
    }

    mode match {
      case "print" =>
        sigs.foreach { case (n, s) => println(f"$n%-34s $s") }
      case "write" =>
        val json = sigs.map { case (k, v) => s""""$k":$v""" }
          .mkString("{\n", ",\n", "\n}\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(BaselinePath), json)
        println(s"wrote ${sigs.size} streaming plan signatures to $BaselinePath")
      case "check" =>
        val base = parseBaseline(java.nio.file.Files.readString(
          java.nio.file.Paths.get(BaselinePath)))
        var drift = 0
        sigs.foreach { case (name, got) =>
          base.get(name) match {
            case None => println(s"NEW      $name $got (not in baseline)"); drift += 1
            case Some(want) if want != got =>
              println(s"DRIFT    $name\n  baseline: $want\n  current:  $got"); drift += 1
            case _ => ()
          }
        }
        base.keySet.diff(sigs.map(_._1).toSet).toSeq.sorted.foreach { gone =>
          println(s"REMOVED  $gone (in baseline, not in registry)"); drift += 1
        }
        println(if (drift == 0)
          s"streaming plan signatures match baseline (${sigs.size} st* entries)"
        else s"$drift streaming plan-shape drifts vs $BaselinePath")
        if (drift != 0) { spark.stop(); sys.exit(1) }
    }
    spark.stop()
  }
}
