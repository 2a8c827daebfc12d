package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[SaltedAgg]]'s contract: the two-stage salted aggregation equals
  * the direct aggregation on skew-shaped data — sum/count/min/max are
  * associative-commutative (exactly what makes them saltable) and avg
  * travels as sum+count.
  */
class SaltingSpec extends AnyFunSuite with SparkTestSession {

  test("SaltedAgg equals the direct aggregate on skewed data") {
    val s = spark; import s.implicits._
    // 90% of rows share one key — the shape that melts a reducer
    val rows = (1L to 2000L).map { i =>
      val key = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (key, i, i % 97)
    }
    val df = rows.toDF("k", "event_id", "v")

    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"),
        min("v").as("min_v"), max("v").as("max_v"), avg("v").as("avg_v"))
      .orderBy("k").collect().toSeq

    val salted = SaltedAgg.aggregate(df, Seq("k"),
        salt = col("event_id") % 8, // deterministic spreader
        aggs = Seq(
          SaltedAgg.Sum("v", "sum_v"), SaltedAgg.Count("n"),
          SaltedAgg.Min("v", "min_v"), SaltedAgg.Max("v", "max_v"),
          SaltedAgg.Avg("v", "avg_v")))
      .orderBy("k").collect().toSeq

    assert(salted === direct)
  }

  test("CollectSet equals array_sort(collect_set) on skewed data") {
    val s = spark; import s.implicits._
    val rows = (1L to 3000L).map { i =>
      val key = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (key, i, i % 211) // hot key sees all 211 distinct values
    }
    val df = rows.toDF("k", "event_id", "v").repartition(8)

    val direct = df.groupBy("k")
      .agg(array_sort(collect_set("v")).as("uniq_v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[Long](1)))

    val salted = SaltedAgg.aggregate(df, Seq("k"),
        salt = col("event_id") % 8,
        aggs = Seq(SaltedAgg.CollectSet("v", "uniq_v")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[Long](1)))

    assert(salted.toSeq === direct.toSeq)
  }

  test("collectSetSharded shards are disjoint and union to the direct set") {
    val s = spark; import s.implicits._
    val rows = (1L to 3000L).map { i =>
      val key = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (key, i % 211)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val sharded = SaltedAgg.collectSetSharded(df, Seq("k"), "v",
        pmod(col("v"), lit(4)), "uniq_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    // within-key shards are disjoint, and their union is the direct set
    sharded.groupBy(_._1).foreach { case (k, g) =>
      val all = g.flatMap(_._3)
      assert(all.length == all.distinct.length, s"key $k shards overlap")
    }
    val direct = df.groupBy("k")
      .agg(array_sort(collect_set("v")).as("uniq_v"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    sharded.groupBy(_._1).foreach { case (k, g) =>
      assert(g.flatMap(_._3).sorted.toSeq == direct(k), s"key $k union mismatch")
    }
  }

  test("salted plan aggregates in two stages (salt key present in stage 1)") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => ("k", i)).toDF("k", "v")
    val plan = SaltedAgg.aggregate(df, Seq("k"), col("v") % 4,
        Seq(SaltedAgg.Sum("v", "sum_v")))
      .queryExecution.optimizedPlan.toString
    // two Aggregate nodes: (k, __salt) then (k)
    assert("(?s)Aggregate.*Aggregate".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("__salt"), plan)
  }
}
