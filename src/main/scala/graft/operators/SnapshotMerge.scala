package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO semantics over plain parquet snapshots — the dataset
  * versioning step of a continuously-ingesting pipeline: fold a batch
  * of changes (upserts + delete tombstones) into the current snapshot,
  * latest version wins per key. The same shape lakehouse table formats
  * implement; expressed here as one declarative pass so Catalyst owns
  * the physical plan.
  *
  * Scale: ONE shuffle on the key (the union is shuffle-free; the
  * per-key latest pick is a window over it), no driver state, no
  * collect. Rewrites only what the caller writes back — pair with
  * [[graft.sources.GenericSource]] partitioned writes to confine the
  * rewrite to changed partitions. The tombstone convention matches
  * [[graft.llm.DedupIndex]].compact.
  */
object SnapshotMerge {

  /** Fold `changes` into `base` and return the next snapshot.
    *
    * `base` must be unique on `keyCols` (it is a snapshot); `changes`
    * carries the same data columns plus `verCol` (monotone version,
    * unique per key within the union — base rows participate at their
    * stored version) and `opCol` ('u' = upsert, 'd' = delete). The
    * output keeps key, data, and winning version; tombstoned keys are
    * absent.
    */
  def apply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
            verCol: String, opCol: String): DataFrame = {
    require(!base.columns.contains("__rn") && !changes.columns.contains("__rn"),
      "input already has a '__rn' column — rename it before merging")
    val all = base.withColumn(opCol, lit("u")).unionByName(changes)
    // ver desc, then op: ties between an upsert and a tombstone at the
    // same version resolve to the upsert ('u' > 'd') — deterministic,
    // though callers should version changes monotonically anyway
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(verCol).desc, col(opCol).desc)
    all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) === "u")
      .drop("__rn", opCol)
  }
}
