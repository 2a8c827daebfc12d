package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the right row with the
  * greatest `rightTime <= leftTime` within the same key group (the
  * temporal/point-in-time join the reference category table lists as
  * "as-of"; SURVEY.md §2.2 joins row).
  *
  * Algorithm: tag + union both sides, one shuffle on the key, sort each
  * partition by (time, side) and carry the right payload forward with
  * `last(_, ignoreNulls = true)` over an unbounded-preceding window,
  * then keep only left rows. A right row at time t sorts before a left
  * row at the same t, so exact-time matches are included (>= semantics).
  *
  * Scale: ONE hash shuffle on `keys` + a per-partition sort — no range
  * cross-product, no per-row binary search on the driver. Skewed keys
  * are handled by AQE; the window is running (not re-scanned per row),
  * so cost is O(n log n) per partition. This is the standard distributed
  * merge_asof and survives 100× data growth as long as single keys fit
  * a partition's sort spill.
  *
  * Requires (keys, rightTime) unique on the right side — pre-aggregate
  * the right side first to make the match deterministic.
  *
  * The whole right row (time + payload) is carried as ONE struct, so a
  * matched row's NULL payload column stays NULL instead of inheriting
  * a value from an older right row (mixed-row results).
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String
  ): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)

    val clash = rightPayload.toSet.intersect(leftPayload.toSet + leftTime)
    require(clash.isEmpty,
      s"asof: right payload columns collide with left columns: ${clash.mkString(", ")} — rename one side")
    val reserved = Set("_t", "_side", "_r")
    val resClash = (left.columns ++ right.columns).filter(reserved).distinct
    require(resClash.isEmpty,
      s"asof: column names ${resClash.mkString(", ")} are reserved by the operator — rename them")

    // one struct holds the entire matched right row
    val rStructFields = (rightTime +: rightPayload.toSeq)
    val rStructType = org.apache.spark.sql.types.StructType(
      rStructFields.map(c => right.schema(right.schema.fieldIndex(c))))

    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructType).as("_r"): _*
    )
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rStructFields.map(col): _*).as("_r"): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.union(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keys.map(col) ++ Seq(col("_t").as(leftTime)) ++
        leftPayload.map(col) ++
        rStructFields.map(c => col("_r").getField(c).as(c)): _*)
  }
}
