package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** q18's HLL sketch has no cross-engine oracle (sketch internals
  * differ by design); its accuracy contract is asserted here instead:
  * approx_count_distinct's default rsd is 5%, so 3 sigma ≈ 15%.
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  test("approx_count_distinct stays within 15% of the exact count") {
    val rows = LlmQueries.all("q18_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("count-min estimates are one-sided and within the eps bound") {
    val d = "/root/testdata/sf0.001"
    val rows = GeneralQueries.all("q33_heavy_hitters")(spark, d).collect()
    assert(rows.length === 5)
    val total = LlmQueries.all("x04_token_stats")(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      assert(est >= exact, s"CMS never undercounts: ${r.getString(0)}")
      assert(est <= exact + (0.001 * total).ceil.toLong,
        s"${r.getString(0)}: est=$est exact=$exact total=$total")
    }
  }

  test("percentile_approx stays within the accuracy-bound rank error") {
    // with accuracy=1000 the summary guarantees rank error <= n/1000;
    // on these value ranges that keeps the approx median within 10%
    // of the exact one
    val rows = GeneralQueries.all("q27_approx_quantiles")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / math.max(exact, 1.0) <= 0.10,
        s"grp=${r.getLong(0)}: approx=$approx exact=$exact")
    }
  }

  test("hll_union over partial sketches equals the whole-table sketch exactly") {
    // the property q55's 5%-bound driver check understates: a
    // DataSketches HLL update is register-max, so the sketch is a
    // deterministic SET-function of its input — merging per-month
    // partials must reproduce the single-pass sketch's estimate
    // EXACTLY (not merely within rsd), or incremental rollups would
    // drift from their from-scratch rebuilds
    import org.apache.spark.sql.functions._
    val ord = Tables.orders(spark, "/root/testdata/sf0.001").select(
      date_trunc("month", col("o_orderdate")).cast("long").as("month_sec"),
      col("o_custkey"))
    val merged = ord.groupBy("month_sec")
      .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val direct = ord
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), 12)).as("est"))
      .head.getLong(0)
    val exact = ord.select("o_custkey").distinct().count()
    assert(merged === direct,
      s"merged-partials estimate $merged != single-pass estimate $direct")
    assert(math.abs(merged.toDouble - exact) / exact <= 0.05,
      s"estimate $merged outside 5% of exact $exact")
  }
}
