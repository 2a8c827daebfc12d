package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of the reference's `histogram` input table
  * (SURVEY.md §1.1 / FIXTURES.md A1) from the driver-generated
  * `events` table, so the same rows are reproducible in both Spark and
  * the DuckDB oracle (every step is exact integer/IEEE-double
  * arithmetic — no RNG, no floating aggregation).
  *
  * Columns: timestamp (unix sec), subagent_id, num_protocol, CountPkt,
  * type_proto ∈ {11,31,32,41,42}, dst_ip (IPv4-as-long).
  *
  * A deterministic 10× "attack" multiplier is applied to keys with
  * `user_id % 5 == 0` inside the current window (last `CurWindowSec`
  * of the table) so the spike pipeline has real positives to find.
  */
object RefHistogram {

  /** Current-window length: last 3 days of the events table. */
  val CurWindowSec: Long = 259200L

  private val tmaxCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Max event time in unix seconds — anchors the analysis windows.
    * Memoized per dataset dir: the table is static, and without the
    * cache every r-query would fire its own full-scan max(ts) driver
    * action before the real query (VERDICT r2 "what's wrong").
    */
  def tmax(spark: SparkSession, sfDir: String): Long =
    tmaxCache.getOrElseUpdate(sfDir,
      Tables.events(spark, sfDir)
        .agg(max(Tables.tsSec))
        .head().getLong(0))

  /** The histogram table (see class doc). `tMax` from [[tmax]]. */
  def derive(events: DataFrame, tMax: Long): DataFrame = {
    val tsSec = Tables.tsSec
    val spiked = tsSec > lit(tMax - CurWindowSec) && col("user_id") % 5 === 0
    events.select(
      tsSec.as("timestamp"),
      (col("event_id") % 4).as("subagent_id"),
      (col("user_id") % 20).cast("int").as("num_protocol"),
      (floor(col("value") * 100) * when(spiked, 10L).otherwise(1L)).as("CountPkt"),
      (element_at(
        array(lit(11), lit(31), lit(32), lit(41), lit(42)),
        (col("event_id") % 5).cast("int") + 1
      )).as("type_proto"),
      (lit(3232235520L) + (col("user_id") * 37) % 1024).as("dst_ip")
    )
  }

  /** DuckDB CTEs computing the identical table; prepend to oracle SQL.
    * Exposes `tmax(t)` and `histogram(...)`.
    */
  val sqlCtes: String =
    s"""WITH tmax AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t FROM events),
       |histogram AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS timestamp,
       |         event_id % 4 AS subagent_id,
       |         CAST(user_id % 20 AS INTEGER) AS num_protocol,
       |         CAST(floor(value * 100) AS BIGINT)
       |           * (CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) > (SELECT t FROM tmax) - $CurWindowSec
       |                    AND user_id % 5 = 0 THEN 10 ELSE 1 END) AS CountPkt,
       |         ([11,31,32,41,42])[CAST(event_id % 5 AS INTEGER) + 1] AS type_proto,
       |         3232235520 + (user_id * 37) % 1024 AS dst_ip
       |  FROM events
       |)""".stripMargin
}
