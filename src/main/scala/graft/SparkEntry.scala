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
}
