package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General operator-inventory queries (SURVEY.md §2.2): aggregations,
  * joins, windows, sorts, set ops, scalar functions — over the
  * TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Cross-engine determinism rule: double columns are converted to
  * exact integer units (cents etc.) *per row* before aggregation, so
  * sums are order-independent bigints and hash identically in Spark
  * and DuckDB regardless of reduction order.
  */
object GeneralQueries {

  /** round-to-cents as exact bigint: round(x * 10^s) */
  private def asInt(c: org.apache.spark.sql.Column, scale: Int) =
    round(c * math.pow(10, scale).toLong).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 aggregations — TPC-H Q1 pricing summary (sum/avg/count)
    "q01_tpch_q1" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          asInt(col("l_quantity"), 0).as("qty"),
          asInt(col("l_extendedprice"), 2).as("price_c"),
          asInt(col("l_discount"), 2).as("disc_c"),
          asInt(col("l_tax"), 2).as("tax_c"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sum_qty"),
          sum("price_c").as("sum_base_price_c"),
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sum_disc_price_e4"),
          sum(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c")))
            .as("sum_charge_e6"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS BIGINT) AS sum_qty,
        |       CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
        |       CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_price_e4,
        |       CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT) AS sum_charge_e6,
        |       count(*) AS count_order
        |FROM (SELECT l_returnflag, l_linestatus,
        |             CAST(round(l_quantity) AS BIGINT) AS qty,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |             CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
        |             CAST(round(l_tax * 100) AS BIGINT) AS tax_c
        |      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
