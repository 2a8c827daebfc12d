package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once parquet sink for `foreachBatch` streams.
  *
  * Structured Streaming's replay contract is at-least-once per
  * micro-batch: after a crash, the LAST batch can run again with the
  * same `batchId` and the same data. The standard recipe (and what
  * the file/delta sinks do internally) is idempotence by batch id:
  *
  *   - each batch writes to its own `batch=<id>/` directory, OVERWRITE
  *     mode, so a half-written attempt is replaced wholesale, never
  *     appended to;
  *   - a zero-byte `_committed_<id>` marker is created only AFTER the
  *     write returns — the marker, not the data files, is the unit of
  *     atomicity (object stores rename non-atomically; a single
  *     marker PUT is atomic);
  *   - a replayed batch whose marker exists returns without writing.
  *
  * Readers take the committed view via [[readCommitted]]: union of
  * exactly the marked batch directories — uncommitted partials are
  * invisible. At scale the per-batch directories then feed
  * [[graft.sources.GenericSource.compact]] on a maintenance cadence,
  * which is why the sink and the compactor share a module boundary.
  */
object IdempotentSink {

  private def markerPath(outDir: String, batchId: Long) =
    new Path(s"$outDir/_committed_$batchId")

  /** The function to pass to `writeStream.foreachBatch`. */
  def writer(outDir: String): (DataFrame, Long) => Unit = { (df, batchId) =>
    val marker = markerPath(outDir, batchId)
    val fs = marker.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      fs.create(marker, false).close()
    }
  }

  /** Batch ids with a commit marker, ascending. Stray files that
    * merely LOOK like markers (backup-tool suffixes, manual touches)
    * are ignored — a malformed name must not take down every reader
    * of the committed view.
    */
  def committedBatches(spark: org.apache.spark.sql.SparkSession,
                       outDir: String): Seq[Long] = {
    val dir = new Path(outDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Marker = "_committed_(\\d+)".r
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case Marker(id) => id.toLong }
      .sorted
  }

  /** The committed prefix of the stream: union of marked batch dirs.
    * One multi-path scan (not a Seq of unions), so the reader side
    * stays a single FileScan over all committed files.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    outDir: String): DataFrame = {
    val ids = committedBatches(spark, outDir)
    require(ids.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(ids.map(id => s"$outDir/batch=$id"): _*)
  }
}
