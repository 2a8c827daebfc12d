package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** PERSISTED IVF-PQ vector index — the fifth [[PersistedIndex]]
  * family (VERDICT r11 ask #1), closing the one 100-TB-shaped gap the
  * index stack had: every x39–x43 query retrained its quantizers
  * in-line, and a 100 TB embedding corpus cannot re-run Lloyd + PQ
  * codebook training per probe batch. The index is FAISS IVFADC's
  * on-disk shape re-expressed as parquet relations:
  *
  *   `dir/centroids`  (vec_id, embedding)          — the coarse quantizer
  *   `dir/codebooks`  (subspace, code, w)          — the M PQ codebooks
  *   `dir/codes/cluster=<c>/…`  (neighbor_id, subspace, code)
  *                                                 — the inverted lists,
  *                                                   PARTITIONED BY CLUSTER
  *   `dir_prov`       (file, flen, fmtime)         — base-file provenance
  *
  * Partitioning the codes by cluster makes the inverted-list structure
  * literal: a probe collects its `nprobe` closest clusters (probe-side
  * only — tiny) and the codes scan opens ONLY those clusters'
  * directories — hive partition pruning IS the IVF list lookup, so
  * probe I/O is nprobe/K of the corpus regardless of corpus size.
  *
  * Lifecycle semantics:
  *  - `create` (re)trains: coarse centroids from the deterministic
  *    id-prefix sample (optionally Lloyd-refined, `lloydRounds`), PQ
  *    codebooks from the same sample (the x39/x41 discipline —
  *    Similarity.pqCodebooks' scaladoc covers when to Lloyd-refine
  *    these too), then encodes the whole base. Re-training on demand
  *    = calling create again (the trait's "(Re)build" verb).
  *  - `append` encodes just-landed base files against the FROZEN
  *    persisted quantizers — no training work, answer-equal to what
  *    create would have produced for those rows (encoding is a
  *    deterministic function of (vector, centroids, codebooks)).
  *  - `compact` folds the per-append small files within each cluster
  *    directory — layout only; replayed at-least-once appends are
  *    identical rows and dedupe away (PersistedIndexSpec pins
  *    bit-identical probes across compaction).
  *  - `staleFiles` rides the [[Provenance]] sidecar: codes are keyed
  *    by vector, not base file, so the fingerprint cannot ride the
  *    rows the way ZoneMap/FileBloom carry it.
  *
  * Probing reads the persisted relations with ZERO training work
  * ([[probe]]): centroids + codebooks are literal-sized by
  * construction (collected once), probe assignment and the e9-integer
  * ADC LUT touch only the probe frame, and the codes join is the same
  * broadcast plan [[Similarity.ivfPqTopK]] builds — so a persisted
  * probe hash-matches the ephemeral x41 path by construction (x86
  * pins it under the DuckDB oracle).
  */
final case class IvfPqIndex(tablePath: String, dir: String,
                            m: Int = 8, subDim: Int = 8,
                            sampleSize: Int = 8, lloydRounds: Int = 0,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding")
    extends PersistedIndex {

  private def centroidsPath = s"$dir/centroids"
  private def codebooksPath = s"$dir/codebooks"
  private def codesPath = s"$dir/codes"
  private def provPath = dir + "_prov"

  /** The deterministic training sample: ids below `sampleSize` — the
    * same discipline x39/x41 use (`vec_id < 8`), so the trained
    * quantizers are oracle-reproducible.
    */
  private def sample(spark: SparkSession): DataFrame =
    spark.read.parquet(tablePath).filter(col(idCol) < sampleSize)

  private def readCentroids(spark: SparkSession): DataFrame =
    spark.read.parquet(centroidsPath)

  private def readCodebooks(spark: SparkSession): Seq[Seq[(Long, Seq[Float])]] = {
    val rows = spark.read.parquet(codebooksPath)
      .select(col("subspace"), col("code"), col("w"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    (0 until m).map { mi =>
      rows.filter(_._1 == mi.toLong).sortBy(_._2)
        .map { case (_, code, w) => (code, w) }.toSeq
    }
  }

  /** Encode `corpus` against the PERSISTED quantizers and append the
    * code rows, hive-partitioned by cluster (the inverted lists).
    */
  private def encodeInto(spark: SparkSession, corpus: DataFrame,
                         mode: String): Unit = {
    val cents = readCentroids(spark)
    val cbs = readCodebooks(spark)
    Similarity.ivfPqEncode(corpus, cents, cbs, subDim, idCol, vecCol)
      .write.partitionBy("cluster").mode(mode).parquet(codesPath)
  }

  override def create(spark: SparkSession): Unit = {
    val base = spark.read.parquet(tablePath)
    val samp = sample(spark)
    val cents0 = samp.select(col(idCol).cast("long").as(idCol), col(vecCol))
    val cents =
      if (lloydRounds <= 0) cents0
      else Similarity.centroidFrameFromE6(
        Similarity.lloydIterateE6(base, cents0, lloydRounds, 0L, idCol, vecCol),
        idCol, vecCol)
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsPath)
    val cbRows = Similarity.pqCodebooks(samp, m, subDim, idCol, vecCol)
      .zipWithIndex.flatMap { case (cb, mi) =>
        cb.map { case (code, w) => (mi.toLong, code, w) }
      }
    spark.createDataFrame(cbRows).toDF("subspace", "code", "w")
      .coalesce(1).write.mode("overwrite").parquet(codebooksPath)
    encodeInto(spark, base, mode = "overwrite")
    Provenance.reset(spark, provPath, ZoneMap.dataFiles(spark, tablePath))
  }

  override def append(spark: SparkSession, files: Seq[String]): Unit =
    if (files.nonEmpty) {
      encodeInto(spark, spark.read.parquet(files: _*), mode = "append")
      Provenance.record(spark, provPath, files)
    }

  /** Layout-only: fold each cluster directory's accumulated
    * per-append files. Encoding is deterministic, so an at-least-once
    * replay's duplicate rows dedupe away without changing any probe
    * (a vector appears once per subspace afterwards, whatever the
    * append history). One file per cluster = one file per inverted
    * list, the read-optimized layout a probe's partition pruning
    * opens.
    */
  override def compact(spark: SparkSession): Unit = {
    // DISK_ONLY snapshot: the codes relation is DATA-SIZED (corpus ×
    // M rows), and the default checkpoint level would pin it
    // deserialized in storage memory for the duration of the rewrite
    // (the 100× lesson — SCALE_r12)
    val snap = spark.read.parquet(codesPath)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      .dropDuplicates("neighbor_id", "subspace")
    snap.repartition(col("cluster")).sortWithinPartitions("cluster")
      .write.partitionBy("cluster").mode("overwrite").parquet(codesPath)
    Provenance.compact(spark, provPath)
  }

  /** The code rows (neighbor_id, subspace, code, cluster) — cluster
    * comes back from the directory names as the partition column.
    */
  override def content(spark: SparkSession): DataFrame =
    spark.read.parquet(codesPath)
      .withColumn("cluster", col("cluster").cast("long"))

  override def staleFiles(spark: SparkSession): Seq[String] =
    Provenance.staleFiles(spark, tablePath, provPath)

  /** Approximate top-k over the PERSISTED index — the zero-training
    * read path: quantizers are read back (literal-sized), the probes'
    * `nprobe` inverted lists are collected (probe-side only), and the
    * codes scan is PARTITION-PRUNED to exactly those lists before the
    * broadcast ADC join. Returns (probe_id, neighbor_id, dist_e9,
    * rnk) — [[Similarity.ivfPqTopK]]'s schema, hash-equal to it.
    */
  def probe(spark: SparkSession, probes: DataFrame, k: Int,
            nprobe: Int): DataFrame = {
    val cents = readCentroids(spark)
    val cbs = readCodebooks(spark)
    // the probed lists, collected once: |probes|·nprobe ids — this is
    // the planning-time partition filter, the IVF lookup itself
    val probed: Seq[Long] =
      Similarity.probeClusters(probes, cents, nprobe, idCol, vecCol)
        .select("cluster").distinct().collect().map(_.getLong(0)).toSeq
    val codes = content(spark)
      .filter(col("cluster").isin(probed: _*))
    Similarity.ivfPqTopKFromCodes(codes, probes, cents, cbs, k, nprobe,
      subDim, idCol, vecCol)
  }
}
