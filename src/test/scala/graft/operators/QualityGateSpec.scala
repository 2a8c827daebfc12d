package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import QualityGate.{audit, flag, split, Rule}

class QualityGateSpec extends AnyFunSuite with SparkTestSession {

  // id 1 valid; id 2 fails pos; id 3 fails both; id 4 NULL value —
  // three-valued logic must count it as a violation, not a pass
  private def data = df("id BIGINT, v BIGINT, s STRING",
    Row(1L, 5L, "a"), Row(2L, -1L, "a"), Row(3L, -2L, "zz"), Row(4L, null, "a"))

  private val rules = Seq(
    Rule("v_pos", col("v") > 0L),
    Rule("s_short", length(col("s")) === 1))

  test("audit: one row per rule with null-safe violation counts") {
    val got = audit(data, rules).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("s_short", 1L, 4L), ("v_pos", 3L, 4L)))
  }

  test("audit is one scan + one reduce regardless of rule count") {
    val q = audit(data, rules ++ Seq(Rule("id_pos", col("id") > 0L)))
    q.collect()
    // the AQE string renders Final AND Initial plans — judge the final
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan)
    // a single partial+final aggregate pair: no per-rule passes crept in
    assert("HashAggregate".r.findAllIn(plan).size === 2, plan)
    assert("Expand".r.findAllIn(plan).size === 1, plan) // the unpivot melt
  }

  test("flag/split: per-row violation lists; quarantine keeps reasons") {
    val flagged = flag(data, rules).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](r.fieldIndex("violations")).toSeq))
    assert(flagged.toSeq === Seq(
      (1L, Nil), (2L, Seq("v_pos")), (3L, Seq("v_pos", "s_short")), (4L, Seq("v_pos"))))

    val (valid, bad) = split(data, rules)
    assert(valid.columns.toSeq === Seq("id", "v", "s"))
    assert(valid.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(bad.count() === 3L)
  }
}
