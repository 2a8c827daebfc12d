package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** LpmJoin unit behavior beyond r10's one oracle-checked config:
  * longest-wins priority, unmatched addresses absent, payload columns
  * carried, and the no-theta-join plan shape.
  */
class LpmJoinSpec extends AnyFunSuite with SparkTestSession {

  private def ip(a: Int, b: Int, c: Int, d: Int): Long =
    (a.toLong << 24) | (b.toLong << 16) | (c.toLong << 8) | d.toLong

  private def prefixes = {
    val s = spark; import s.implicits._
    Seq(
      (ip(10, 0, 0, 0), 8, "corp"),
      (ip(10, 1, 0, 0), 16, "dc1"),
      (ip(10, 1, 2, 0), 24, "rack7"),
      (ip(192, 168, 0, 0), 16, "lab")
    ).toDF("net", "len", "label")
  }

  test("the most specific containing prefix wins; unmatched ips are absent") {
    val s = spark; import s.implicits._
    val ips = Seq(
      ip(10, 1, 2, 3),   // matches /8, /16, /24 -> rack7
      ip(10, 1, 9, 9),   // matches /8, /16     -> dc1
      ip(10, 9, 9, 9),   // matches /8          -> corp
      ip(192, 168, 5, 1), // lab
      ip(172, 16, 0, 1)  // no match -> absent
    ).toDF("addr")
    val got = LpmJoin.lpm(ips, prefixes, "addr")
      .orderBy("addr")
      .select("addr", "len", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (ip(10, 1, 2, 3), 24, "rack7"),
      (ip(10, 1, 9, 9), 16, "dc1"),
      (ip(10, 9, 9, 9), 8, "corp"),
      (ip(192, 168, 5, 1), 16, "lab")
    ).sortBy(_._1))
  }

  test("duplicate input addresses collapse to one classified row") {
    val s = spark; import s.implicits._
    val ips = Seq.fill(5)(ip(10, 1, 2, 3)).toDF("addr")
    assert(LpmJoin.lpm(ips, prefixes, "addr").count() === 1)
  }

  test("plan: broadcast equi-join, never a nested-loop containment join") {
    val s = spark; import s.implicits._
    val ips = (0 until 1000).map(i => ip(10, 1, i % 4, i % 250)).toDF("addr")
    val df = LpmJoin.lpm(ips, prefixes, "addr")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"LPM must stay an equi-join:\n$plan")
  }
}
