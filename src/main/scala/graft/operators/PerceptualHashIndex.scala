package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.llm.Multimodal

/** The PERSISTED perceptual-hash index — multimodal near-dup's
  * lifecycle brought up to what text dedup has (VERDICT r15 ask #2):
  * x91 computed its dHash fingerprints per query, re-running the
  * decode seam's exact-collapse window and banded join from scratch
  * each time, while an image-text pipeline re-ingesting daily wants
  * the fingerprint relation persisted at decode time and
  * delta-maintained exactly like [[graft.llm.DedupIndex]]'s band
  * index. Two relations under `dir`:
  *
  *  - `fps` — the doc-level (idCol, ph) fingerprints, one row per
  *    media item, written by the decode stage
  *    ([[Multimodal.fingerprints]] — the ONLY place payload bytes are
  *    read). The `_sigs`-sidecar analogue: the delete path and the
  *    star edges scan this, never the payloads.
  *  - `reps` — the hash-DISTINCT kept-representative rows (the
  *    [[graft.llm.Dedup.bandIndexDistinct]] discipline): one row per
  *    distinct ph, carrying the group's kept representative id. The
  *    banded self-join runs on THIS relation, so candidate economics
  *    stay linear in duplicate-group size however many renditions of
  *    one asset pile up. Band keys are pure shifts of the 60-bit ph,
  *    so unlike minhash they are (re)derived at probe time for free —
  *    no banded rows are materialized.
  *
  * Maintenance is the dedup index's, delta-priced end to end: append
  * decodes ONLY the just-landed files and folds hash-distinct rows
  * with the existing-rep-wins rule ([[graft.llm.Dedup
  * .foldIndexDistinct]]'s theorem — identical hashes carry identical
  * band keys and distance 0, so connectivity is invariant to which id
  * represents the group); delete re-elects representatives in exactly
  * the groups whose kept rep died; compact folds accumulated
  * per-batch files. Staleness rides the [[Provenance]] sidecar like
  * every contribution index. Registered as catalog kind "perceptual",
  * discovered via [[graft.sources.IndexAdvisor.perceptualDiscovered]],
  * and reached by [[Takedown]].
  *
  * @param gridRows/@param gridCols the dHash sampling grid (VERDICT
  *   r15 ask #6) — 1×61 is the x91 1-D form; 4×16 is the 2-D
  *   production default for images (x91b).
  */
final case class PerceptualHashIndex(tablePath: String, payloadCol: String,
                                     idCol: String, dir: String,
                                     gridRows: Int = 1, gridCols: Int = 61)
    extends PersistedIndex {

  private def fpsPath = s"$dir/fps"
  private def repsPath = s"$dir/reps"
  private def provPath = dir + "_prov"

  private def fingerprint(df: DataFrame): DataFrame =
    Multimodal.fingerprints(df, payloadCol, idCol, gridRows, gridCols)

  /** Group-minimum representative per distinct hash — create's form
    * (equal to x91's window-derived reps by construction).
    */
  private def repsOf(fps: DataFrame): DataFrame =
    fps.groupBy("ph").agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("ph"))

  override def create(spark: SparkSession): Unit = {
    // one decode pass feeds both relations (the DedupIndex.create
    // discipline); DISK_ONLY — corpus-sized, two longs per item
    val fps = fingerprint(spark.read.parquet(tablePath))
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    fps.write.mode("overwrite").parquet(fpsPath)
    repsOf(fps).write.mode("overwrite").parquet(repsPath)
    Provenance.reset(spark, provPath, ZoneMap.dataFiles(spark, tablePath))
  }

  override def append(spark: SparkSession, files: Seq[String]): Unit =
    if (files.nonEmpty) {
      val batch = fingerprint(spark.read.parquet(files: _*))
        .localCheckpoint(true)
      batch.write.mode("append").parquet(fpsPath)
      // existing-rep-wins fold: the index side is never shuffled — one
      // streamed scan against the BROADCAST batch hash set finds the
      // already-represented hashes, the batch's candidate reps
      // anti-join them (the foldIndexDistinct shape; batch-sized)
      val batchReps = repsOf(batch)
      val matched = spark.read.parquet(repsPath).select("ph")
        .join(broadcast(batchReps.select("ph")), Seq("ph"), "left_semi")
        .distinct()
      // re-select after the ph-join: the join key moves to the front,
      // and parquet appends must keep every file's column order equal
      batchReps.join(broadcast(matched), Seq("ph"), "left_anti")
        .select(col(idCol), col("ph"))
        .write.mode("append").parquet(repsPath)
      Provenance.record(spark, provPath, files)
    }

  /** Fold accumulated per-append files; answers unchanged. Replayed
    * at-least-once appends leave IDENTICAL duplicate rows (the batch's
    * fingerprints and its fold-survivors are deterministic), so the
    * (idCol, ph) dedupe keeps the same relations.
    */
  override def compact(spark: SparkSession): Unit = {
    // no coalesce-to-1: both relations are DATA-sized (fps ∝ corpus,
    // reps ∝ distinct hashes) — the dedupe shuffle's own partitioning
    // sizes the rewrite, unlike the KB-scale per-file stats indexes
    Seq(fpsPath, repsPath).foreach { p =>
      spark.read.parquet(p).localCheckpoint(true)
        .dropDuplicates(idCol, "ph")
        .write.mode("overwrite").parquet(p)
    }
    Provenance.compact(spark, provPath)
  }

  /** The doc-level fingerprint relation — every create/append so far. */
  override def content(spark: SparkSession): DataFrame =
    spark.read.parquet(fpsPath)

  /** The hash-distinct kept-representative rows (the banded join's input). */
  def reps(spark: SparkSession): DataFrame =
    spark.read.parquet(repsPath)

  override def staleFiles(spark: SparkSession): Seq[String] =
    Provenance.staleFiles(spark, tablePath, provPath)

  /** Near-duplicate pairs from the PERSISTED relations alone — x91's
    * answer without re-running the decode stage
    * ([[Multimodal.perceptualPairsFromIndex]]; x93 pins it against
    * x91's banding-free DuckDB oracle verbatim).
    */
  def pairs(spark: SparkSession, maxHamming: Long = 3L): DataFrame =
    Multimodal.perceptualPairsFromIndex(content(spark), reps(spark),
      idCol, maxHamming)

  /** The DELETION verb (the [[graft.llm.Dedup.deleteFromIndexDistinct]]
    * template): tombstoned rows leave both relations, and ONLY hash
    * groups whose KEPT REPRESENTATIVE died re-elect — the next-minimum
    * retained member steps up, from the fps relation, no payload ever
    * re-decoded. Both relations are streamed once against broadcast
    * batch-sized sets (gated on measured counts, the 2M rule, so a
    * mass takedown degrades to shuffle joins rather than driver OOM);
    * untouched groups' rows pass through verbatim.
    */
  def delete(spark: SparkSession, tombstones: DataFrame): Unit = {
    val dead = tombstones.select(col(idCol).cast("long").as(idCol))
      .distinct().localCheckpoint(false) // lazy: the gate count materializes it
    val deadSide = if (dead.count() <= 2000000L) broadcast(dead) else dead
    // eager checkpoints before the overwrites: both plans read the
    // directories being rewritten (the compact rule)
    val retainedFps = spark.read.parquet(fpsPath)
      .join(deadSide, Seq(idCol), "left_anti")
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    // groups whose kept rep died: ∝ tombstones, batch-sized
    val deadRepPhs = spark.read.parquet(repsPath)
      .join(deadSide, Seq(idCol), "left_semi")
      .select("ph").distinct()
      .localCheckpoint(false) // lazy: the gate count materializes it
    val drpSide = if (deadRepPhs.count() <= 2000000L) broadcast(deadRepPhs)
                  else deadRepPhs
    val reElected = repsOf(
      retainedFps.join(drpSide, Seq("ph"), "left_semi"))
    val newReps = spark.read.parquet(repsPath)
      .join(deadSide, Seq(idCol), "left_anti")
      .unionByName(reElected)
      .localCheckpoint(true)
    retainedFps.write.mode("overwrite").parquet(fpsPath)
    newReps.write.mode("overwrite").parquet(repsPath)
  }
}
