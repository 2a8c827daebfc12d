package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Sketch-driven join planning ([[SketchStats]] +
  * [[graft.plans.SketchBroadcastRule]]): persisted Count-Min column
  * stats bound a filtered side's cardinality, and the injected hint
  * flips the join SMJ→BHJ where static size stats see only the whole
  * file. The estimate's direction (over-count only) makes the hint
  * safe; these tests pin the bound, the flip, the answer equality,
  * the threshold guard, and registry hygiene.
  */
class SketchBroadcastSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"
  private val OrdersPath = s"$D/orders.parquet"

  private def orders = spark.read.parquet(OrdersPath)
  private def lineitem = spark.read.parquet(s"$D/lineitem.parquet")

  private def buildAndRegister(thresholdBytes: Long = 10L << 20): Unit = {
    val statsDir = graft.core.Scratch.dir("sketch_stats_spec") + "/orders_priority"
    SketchStats.build(orders, col("o_orderpriority"), statsDir)
    SketchStats.register(spark, statsDir, OrdersPath, "o_orderpriority",
      avgRowBytes = 64, thresholdBytes = thresholdBytes)
  }

  private def joinDf: DataFrame =
    lineitem
      .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))

  /** Executed-plan string with static auto-broadcast off, collected
    * eagerly inside the scope so the compiled plan is the scoped one.
    */
  private def planAndRows(): (String, Set[String]) =
    SketchStats.withStaticBroadcastOff(spark) {
      val df = joinDf
      val rows = df.collect().map(_.mkString("|")).toSet
      (df.queryExecution.executedPlan.toString, rows)
    }

  test("point estimates upper-bound exact group counts, tightly here") {
    try {
      buildAndRegister()
      val exact = orders.groupBy("o_orderpriority").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact.size >= 3)
      exact.foreach { case (v, n) =>
        val est = SketchStats.estimateRows(OrdersPath, "o_orderpriority", Seq(v)).get
        assert(est >= n, s"CM bound violated for $v: est $est < exact $n")
        // 5 keys in 8192 buckets x 4 depths: collision-free in practice
        assert(est <= n + n / 10, s"estimate for $v unexpectedly loose: $est vs $n")
      }
      // IN-list sums the member bounds
      val two = exact.keys.take(2).toSeq
      val estTwo = SketchStats.estimateRows(OrdersPath, "o_orderpriority", two).get
      assert(estTwo >= two.map(exact).sum)
    } finally SketchStats.clear()
  }

  test("registered stats flip the filtered join SMJ -> BHJ, same answer") {
    SketchStats.clear()
    val (coldPlan, coldRows) = planAndRows()
    assert(coldPlan.contains("SortMergeJoin") && !coldPlan.contains("BroadcastHashJoin"),
      s"expected the static-stats plan to sort-merge; got:\n$coldPlan")
    try {
      buildAndRegister()
      val (hotPlan, hotRows) = planAndRows()
      assert(hotPlan.contains("BroadcastHashJoin"),
        s"expected the sketch hint to broadcast; got:\n$hotPlan")
      assert(hotRows == coldRows, "hinted plan changed the answer")
    } finally SketchStats.clear()
  }

  test("a bound above the registered threshold does not hint") {
    try {
      buildAndRegister(thresholdBytes = 1)
      val (plan, _) = planAndRows()
      assert(!plan.contains("BroadcastHashJoin"),
        s"threshold 1 byte must suppress the hint; got:\n$plan")
    } finally SketchStats.clear()
  }

  test("predicates on unregistered columns contribute no evidence") {
    try {
      buildAndRegister()
      val (plan, _) = SketchStats.withStaticBroadcastOff(spark) {
        val df = lineitem
          .join(orders.filter(col("o_custkey") % 2 === 0),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        df.collect()
        (df.queryExecution.executedPlan.toString, ())
      }
      assert(!plan.contains("BroadcastHashJoin"),
        s"no registered-column predicate, no hint; got:\n$plan")
    } finally SketchStats.clear()
  }

  test("an empty registry leaves plans untouched and rules cheap") {
    SketchStats.clear()
    assert(SketchStats.isEmpty)
    val (plan, _) = planAndRows()
    assert(plan.contains("SortMergeJoin"))
  }

  test("an alias SHADOWING the registered name borrows no bound") {
    // a Project that names a DIFFERENT column o_orderpriority: the CM
    // bound describes the true priority column's distribution, so
    // applying it to the status values would justify a broadcast with
    // someone else's evidence (ADVICE r10). After alias resolution the
    // predicate reaches the leaf as a status predicate — unregistered,
    // no bound, the join must stay sort-merge.
    try {
      buildAndRegister()
      val status = orders.select("o_orderstatus").head().getString(0)
      val (plan, _) = SketchStats.withStaticBroadcastOff(spark) {
        val dim = orders
          .select(col("o_orderkey"), col("o_orderstatus").as("o_orderpriority"))
          .filter(col("o_orderpriority") === status)
        val df = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        df.collect()
        (df.queryExecution.executedPlan.toString, ())
      }
      assert(!plan.contains("BroadcastHashJoin"),
        s"a shadowing alias must not borrow the registered bound; got:\n$plan")
    } finally SketchStats.clear()
  }

  test("a plain RENAME of the registered column still carries its bound") {
    // alias resolution is not just a veto: a predicate on an honest
    // rename resolves to the true attribute and keeps its evidence
    try {
      buildAndRegister()
      val (plan, _) = SketchStats.withStaticBroadcastOff(spark) {
        val dim = orders
          .select(col("o_orderkey"), col("o_orderpriority").as("prio"))
          .filter(col("prio") === "1-URGENT")
        val df = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        df.collect()
        (df.queryExecution.executedPlan.toString, ())
      }
      assert(plan.contains("BroadcastHashJoin"),
        s"a rename must keep the registered bound; got:\n$plan")
    } finally SketchStats.clear()
  }
}
