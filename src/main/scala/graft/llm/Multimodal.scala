package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata. At 100 TB
  * the payload column dominates storage — keep it a single `binary`
  * column so Parquet stores it contiguously and column pruning drops
  * it for metadata-only queries.
  */
final case class MediaRecord(
    doc_id: Long,
    media: Array[Byte],
    mime: String,
    lang: String,
    source: String)

/** Deterministic per-item features produced by the decode stage. */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    checksum: Long,
    byte_hist: Array[Long], // 16 buckets over the high nibble
    n_frames: Int,
    mime: String)

/** Multimodal-column plumbing (builder brief): treat image/audio/video
  * as opaque `binary` + typed metadata, with decode / feature-extract
  * as a per-partition batch stage.
  *
  * The CONTAINER HAS NO MEDIA CODECS, so [[decodeStub]] is a
  * clearly-marked deterministic fake — byte-level "features" any
  * environment reproduces. Everything around it is the real engine
  * surface: schema, typed Dataset boundary, partition-batched
  * execution (`mapPartitions`, the Scala analogue of `mapInPandas`
  * batches: amortize codec init per partition, stream items, never
  * collect), and pruning-friendly column layout.
  */
object Multimodal {

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Bind the documents table into media records (text bytes stand in
    * for real payloads; a production source would read image/audio
    * files into the same shape).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("application/octet-stream").as("mime"),
      col("lang"), col("source")
    ).as[MediaRecord]

  /** STUB decode — stands in for an image/audio decoder the container
    * lacks. Deterministic pure function of the payload bytes:
    * checksum = sum of unsigned bytes; byte_hist = counts per high
    * nibble; n_frames = ceil(len/64) ("frame sampling" a 64-byte
    * chunk per frame). A real deployment swaps ONLY this function.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < r.media.length) {
      val b = r.media(i) & 0xff
      hist(b >>> 4) += 1
      sum += b
      i += 1
    }
    MediaFeatures(r.doc_id, r.media.length.toLong, sum, hist,
      n_frames = (r.media.length + 63) / 64, mime = r.mime)
  }

  /** Partition-batched feature extraction: one decoder "session" per
    * partition (where codec/model init would live), items streamed
    * through it. Executors process partitions independently — the
    * plan scales with partition count, no driver involvement.
    */
  def extractFeatures(ds: Dataset[MediaRecord],
                      decode: MediaRecord => MediaFeatures = decodeStub): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      // per-partition init seam (codec handles, ONNX session, ...)
      it.map(decode)
    }

  /** STUB resize — stands in for an image/audio downsample the
    * container can't run. Deterministic: keeps every `factor`-th
    * payload byte (a real deployment swaps in the codec's scaler).
    * Shrinks the payload ~factor× while preserving the record shape,
    * so downstream stages (decode, frame sampling, storage) run
    * unchanged on the reduced representation.
    */
  def resizeStub(r: MediaRecord, factor: Int): MediaRecord = {
    require(factor >= 1, "resize factor must be >= 1")
    val out = new Array[Byte]((r.media.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = r.media(i * factor); i += 1 }
    r.copy(media = out)
  }

  /** Partition-batched resize over the same seam as [[extractFeatures]]. */
  def resize(ds: Dataset[MediaRecord], factor: Int,
             scale: (MediaRecord, Int) => MediaRecord = resizeStub): Dataset[MediaRecord] =
    ds.mapPartitions(_.map(scale(_, factor)))
}
