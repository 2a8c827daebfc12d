package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.AsOfJoin

/** The custom logical-plan/strategy/physical-operator as-of join
  * (extension tier (c)): answers must be identical to the composed
  * union+window operator on adversarial data, and the physical plan
  * must be the streaming merge — no Window, no Union.
  */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestSession {

  private def randomSides(seed: Long) = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    // keys 0–9 on the left, 3–12 on the right → unmatched groups on
    // both sides; duplicate times within keys → tie semantics exercised
    val l = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(1000))).toDF("k", "lt", "lpay")
    val r = Seq.fill(150)((rnd.nextInt(10).toLong + 3L, rnd.nextInt(50).toLong,
      rnd.nextInt(1000)))
      .toDF("k", "rt", "rpay0")
      // unique (k, rt) so the match is deterministic on both paths
      .groupBy("k", "rt").agg(max("rpay0").as("rpay"))
    (l, r)
  }

  test("native == composed on random data with ties and unmatched keys") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val (l, r) = randomSides(seed)
      val composed = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt")
        .select("k", "lt", "lpay", "rt", "rpay")
      val native = AsOfJoin.backwardNative(l, r, Seq("k"), "lt", "rt")
        .select("k", "lt", "lpay", "rt", "rpay")
      val c = composed.collect().map(_.toSeq).sortBy(_.mkString(","))
      val n = native.collect().map(_.toSeq).sortBy(_.mkString(","))
      assert(n.length === c.length, s"row count differs for seed $seed")
      assert(n.toSeq === c.toSeq, s"rows differ for seed $seed")
    }
  }

  test("exact-time tie matches (>= semantics) and null payload preserved") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "lt", "lpay")
    val r = Seq((1L, 10L, Some("tie")), (1L, 4L, Option.empty[String]))
      .toDF("k", "rt", "rpay")
    val got = AsOfJoin.backwardNative(l, r, Seq("k"), "lt", "rt").head
    assert(got.getLong(3) === 10L)
    assert(got.getString(4) === "tie")

    val rNull = Seq((1L, 5L, Some("x")), (1L, 10L, Option.empty[String]))
      .toDF("k", "rt", "rpay")
    val got2 = AsOfJoin.backwardNative(l, rNull, Seq("k"), "lt", "rt").head
    assert(got2.getLong(3) === 10L)
    assert(got2.isNullAt(4)) // matched row's null payload, not the older value
  }

  test("left row with no earlier right row gets nulls (left outer)") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 3L, "early"), (9L, 100L, "nokey")).toDF("k", "lt", "lpay")
    val r = Seq((1L, 5L, "later")).toDF("k", "rt", "rpay")
    val got = AsOfJoin.backwardNative(l, r, Seq("k"), "lt", "rt")
      .orderBy("k").collect()
    assert(got.forall(row => row.isNullAt(3) && row.isNullAt(4)))
  }

  test("physical plan is the streaming merge: AsOfJoinExec, no Window/Union") {
    val (l, r) = randomSides(3L)
    val plan = AsOfJoin.backwardNative(l, r, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "native path must not plan a window")
    assert(!plan.contains("Union"), "native path must not union the sides")
  }

  test("right payload name colliding with a left column is rejected early") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 1L, "a")).toDF("k", "lt", "lpay")
    val rClash = Seq((1L, 1L, "x")).toDF("k", "rt", "lpay")
    assertThrows[IllegalArgumentException](
      AsOfJoin.backwardNative(l, rClash, Seq("k"), "lt", "rt"))
  }

  test("a bucketed+sorted right side joins with NO right-side exchange " +
    "(the layout-reuse case the union+window plan can never hit)") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_bkt")
    val l = Seq.tabulate(200)(i => (i.toLong % 10, i.toLong, i)).toDF("k", "lt", "lpay")
    graft.sources.GenericSource.writeBucketed(
      Seq.tabulate(100)(i => (i.toLong % 10, i.toLong * 2, i)).toDF("k", "rt", "rpay"),
      table = "asof_bkt_right", path = s"$dir/right", buckets = 4,
      keys = Seq("k"), sortCols = Seq("k", "rt"))
    try {
      val native = AsOfJoin.backwardNative(l, s.table("asof_bkt_right"),
        Seq("k"), "lt", "rt")
      assert(native.count() === 200L)
      val plan = native.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected only the left-side exchange; plan:\n$plan")
    } finally s.sql("DROP TABLE IF EXISTS asof_bkt_right")
  }

  test("left-only filters push through the join to the scan; " +
    "right-side filters stay above") {
    val (l, r) = randomSides(11L)
    val filtered = AsOfJoin.backwardNative(l, r, Seq("k"), "lt", "rt")
      .filter(col("lpay") > 500 && col("rpay") > 500)

    val optimized = filtered.queryExecution.optimizedPlan
    // the as-of node's left child must now contain the lpay predicate
    val j = optimized.collect { case p: AsOfJoinPlan => p }.head
    assert(j.left.toString.contains("lpay"),
      s"left filter not pushed below the join:\n$optimized")
    assert(!j.left.toString.contains("rpay"))
    // and the rpay predicate must still be above the join
    val above = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).toSeq.contains("rpay") => f
    }
    assert(above.nonEmpty, s"right filter must remain above the join:\n$optimized")

    // pushdown must not change answers: compare against the composed path
    val expected = AsOfJoin.backward(l, r, Seq("k"), "lt", "rt")
      .filter(col("lpay") > 500 && col("rpay") > 500)
      .select("k", "lt", "lpay", "rt", "rpay")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val got = filtered.select("k", "lt", "lpay", "rt", "rpay")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(got.toSeq === expected.toSeq)
  }

  test("multi-key join groups by the full key tuple") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b")).toDF("k1", "k2", "lt", "lpay")
    val r = Seq((1L, 1L, 5L, "m1"), (1L, 2L, 7L, "m2")).toDF("k1", "k2", "rt", "rpay")
    val got = AsOfJoin.backwardNative(l, r, Seq("k1", "k2"), "lt", "rt")
      .orderBy("k2").collect()
    assert(got.map(_.getString(5)).toSeq === Seq("m1", "m2"))
  }

  test("native forward/nearest/tolerance == composed on random data") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lt", "lpay", "rt", "rpay")
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    for (seed <- Seq(1L, 7L, 42L); tol <- Seq(None, Some(5L), Some(0L))) {
      val (l, r) = randomSides(seed)
      assert(rows(AsOfJoin.forwardNative(l, r, Seq("k"), "lt", "rt", tol)) ===
        rows(AsOfJoin.forward(l, r, Seq("k"), "lt", "rt", tol)),
        s"forward seed=$seed tol=$tol")
      assert(rows(AsOfJoin.nearestNative(l, r, Seq("k"), "lt", "rt", tol)) ===
        rows(AsOfJoin.nearest(l, r, Seq("k"), "lt", "rt", tol)),
        s"nearest seed=$seed tol=$tol")
      assert(rows(AsOfJoin.backwardNativeTol(l, r, Seq("k"), "lt", "rt", tol)) ===
        rows(AsOfJoin.backward(l, r, Seq("k"), "lt", "rt", tol)),
        s"backward seed=$seed tol=$tol")
    }
  }

  test("forward takes the exact-time row; nearest breaks ties backward") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "lt", "lpay")
    val r = Seq((1L, 10L, "attime"), (1L, 12L, "later"))
      .toDF("k", "rt", "rpay")
    assert(AsOfJoin.forwardNative(l, r, Seq("k"), "lt", "rt")
      .head.getString(4) === "attime")
    // equidistant backward/forward: backward wins
    val r2 = Seq((1L, 8L, "back"), (1L, 12L, "fwd")).toDF("k", "rt", "rpay")
    assert(AsOfJoin.nearestNative(l, r2, Seq("k"), "lt", "rt")
      .head.getString(4) === "back")
    // tolerance excludes the near side -> the other side matches
    assert(AsOfJoin.nearestNative(l, r2, Seq("k"), "lt", "rt", Some(1L))
      .head.isNullAt(4))
  }

  test("all directions plan the same streaming merge (no Window/Union)") {
    val (l, r) = randomSides(5L)
    for (q <- Seq(AsOfJoin.forwardNative(l, r, Seq("k"), "lt", "rt"),
                  AsOfJoin.nearestNative(l, r, Seq("k"), "lt", "rt", Some(9L)))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan)
      assert(!plan.contains("Window") && !plan.contains("Union"), plan)
    }
  }
}
