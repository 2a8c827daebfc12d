package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Salted two-stage aggregation (builder brief "salting for skew"):
  * a hot key that would funnel into one reducer is split across
  * `salt` sub-keys for the wide first stage; the second stage
  * combines the (tiny) per-salt partials. Results are provably
  * identical to the direct aggregation — sum/count/min/max are
  * associative-commutative, which is exactly what makes them
  * saltable. (avg must travel as sum+count, reconstructed after.)
  */
class SaltingSpec extends AnyFunSuite with SparkTestSession {

  test("two-stage salted aggregate equals the direct aggregate on skewed data") {
    val s = spark; import s.implicits._
    // 90% of rows share one key — the shape that melts a reducer
    val rows = (1L to 2000L).map { i =>
      val key = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (key, i, i % 97)
    }
    val df = rows.toDF("k", "event_id", "v")

    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"),
        min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("k").collect().toSeq

    val salted = df
      .withColumn("salt", col("event_id") % 8) // deterministic spreader
      .groupBy("k", "salt")
      .agg(sum("v").as("ps"), count(lit(1)).as("pn"),
        min("v").as("pmin"), max("v").as("pmax"))
      .groupBy("k")
      .agg(sum("ps").as("sum_v"), sum("pn").as("n"),
        min("pmin").as("min_v"), max("pmax").as("max_v"))
      .orderBy("k").collect().toSeq

    assert(salted === direct)
  }
}
