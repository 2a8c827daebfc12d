package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Runtime bloom-filter join pruning (builder brief "push down and
  * prune"): when a selective dimension joins a fact over a SHUFFLE
  * join (the filter side too big to broadcast — broadcast joins
  * already prune and correctly skip bloom injection), Spark injects a
  * bloom filter of the dim keys into the fact scan side, dropping
  * non-matching fact rows before the exchange. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * the ~matching fraction.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestSession {

  test("selective shuffle join injects a bloom filter on the fact side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // force the shuffle-join regime bloom pruning exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // test tables are tiny; drop the size gate so the rule fires
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val d = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val p = spark.read.parquet(s"$d/part.parquet").filter(col("p_size") === 1)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloom"), s"expected a runtime bloom filter; plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
