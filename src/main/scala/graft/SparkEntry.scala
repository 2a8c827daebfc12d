package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 has an
  * entry in [[queries]]; SQL-expressible ones have a DuckDB oracle in
  * [[oracleSql]] producing identical rows/column names.
  */
object SparkEntry {

  /** Flagship: the reference's full spike-detection pipeline
    * (SURVEY.md §2.1 #1–17) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.all("r05_spike_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-training-data pipeline x-series (dedup, similarity, text).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.all ++ GeneralQueries.all ++ LlmQueries.all ++ StreamingQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ GeneralQueries.oracles ++ LlmQueries.oracles ++
      StreamingQueries.oracles

  /** Adjudication notes for queries WITHOUT an oracleSql entry — the
    * driver records those as `err: no_oracle`, which reads as a
    * failure to anyone without the round history (VERDICT r13 ask #7).
    * Verify dumps this beside oracle_sql.json so the round artifact is
    * self-describing: each note says WHY no deterministic cross-engine
    * oracle can exist and which green bound-checked b-variant carries
    * the correctness claim instead.
    */
  def oracleNotes: Map[String, String] = Map(
    "q18_approx_distinct" -> ("rows_only_by_design: Spark's " +
      "approx_count_distinct is HyperLogLog++ with Spark's own hash and " +
      "register layout; DuckDB's approx_count_distinct is its own HLL — " +
      "the two estimates differ by construction, so no deterministic " +
      "cross-engine rendering exists. Correctness rides " +
      "q18b_approx_distinct_bound (full rows+schema+hash pass): every " +
      "group's estimate within the configured rsd of DuckDB's EXACT " +
      "count distinct."),
    "q27_approx_quantiles" -> ("rows_only_by_design: Spark's " +
      "approx_percentile is Greenwald-Khanna; DuckDB's approx_quantile " +
      "is t-digest — different sketches, different (both within-bound) " +
      "answers, no deterministic cross-engine rendering. Correctness " +
      "rides q27b_approx_quantiles_bound (full pass): each approximate " +
      "quantile within the configured accuracy's rank error of DuckDB's " +
      "EXACT quantile."),
    "q33_heavy_hitters" -> ("rows_only_by_design: Misra-Gries summaries " +
      "report frequency ESTIMATES whose exact values depend on stream " +
      "merge order; DuckDB has no Misra-Gries at all. Correctness rides " +
      "q33b_heavy_hitters_bound (full pass): the sketch's support set " +
      "and error bound checked against DuckDB's exact counts."))
}
