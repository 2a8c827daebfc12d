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

  test("audit totals equal flag-level counts over 300 seeded random rows") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      (i, if (rnd.nextInt(10) == 0) null.asInstanceOf[java.lang.Long]
          else java.lang.Long.valueOf(rnd.nextLong() % 100L),
        rnd.alphanumeric.take(rnd.nextInt(3)).mkString)
    }.toDF("id", "v", "s")
    val rs = Seq(
      Rule("v_pos", col("v") > 0L),
      Rule("s_nonempty", length(col("s")) > 0),
      Rule("id_small", col("id") <= 150L))
    val audited = audit(rows, rs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flagged = flag(rows, rs)
      .select(explode(col("violations")).as("rule"))
      .groupBy("rule").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audited.filter(_._2 > 0L) === flagged)
    val (valid, bad) = split(rows, rs)
    assert(valid.count() + bad.count() === 300L)
  }

  test("empty input audits as zero violations; reserved/duplicate rule names refused") {
    val empty = data.filter(col("id") < 0L)
    val got = audit(empty, rules).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("s_short", 0L, 0L), ("v_pos", 0L, 0L)))
    intercept[IllegalArgumentException] { audit(data, Seq(Rule("n_rows", col("v") > 0L))) }
    intercept[IllegalArgumentException] {
      audit(data, Seq(Rule("a", col("v") > 0L), Rule("a", col("v") < 9L)))
    }
    intercept[IllegalArgumentException] {
      flag(data.withColumn("violations", lit("x")), rules)
    }
  }

  test("auditDuring: metrics ride the caller's action and match audit()") {
    val dir = java.nio.file.Files.createTempDirectory("qg_obs").toString + "/out"
    val (out, obs) = QualityGate.auditDuring(data, rules)
    out.write.mode("overwrite").parquet(dir) // the only action that runs
    val m = obs.get
    assert(m("n_rows") === 4L && m("v_pos") === 3L && m("s_short") === 1L)
    // and the write really happened with all rows
    assert(spark.read.parquet(dir).count() === 4L)
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
