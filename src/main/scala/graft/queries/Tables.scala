package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {

  /** events.ts is read as Long nanoseconds (see GraftSession's
    * nanosAsLong); exact integer division to unix seconds.
    */
  val tsSec: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("ts div 1000000000")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Repartition `df` on `key` ONLY when its scan produced fewer
    * partitions than the session's parallelism. The local testdata is
    * one parquet split, which would serialize cpu-bound per-row work
    * (shingle hashing, tokenizing) on a single core — and AQE would
    * coalesce a byte-small exchange right back, so the explicit
    * partition count matters. At cluster scale the input arrives
    * pre-split and this helper inserts NOTHING; an unconditional
    * repartition(n, key) would pay a full payload exchange even on
    * well-split input (VERDICT r3).
    */
  def splitForCpu(spark: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
