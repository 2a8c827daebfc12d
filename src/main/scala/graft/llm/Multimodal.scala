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
    mime: String,
    dhash60: Long) // difference-hash perceptual fingerprint ([[Multimodal.dhash60OfBytes]])

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
      n_frames = (r.media.length + 63) / 64, mime = r.mime,
      dhash60 = dhash60OfBytes(r.media))
  }

  /** dHash-style 60-bit PERCEPTUAL fingerprint of a decoded payload —
    * the classic difference hash (resize to a fixed grid, set a bit
    * per adjacent-intensity comparison), computed here over the
    * byte stream as a 1-D signal: 61 nearest-neighbor samples at
    * positions (i·len) DIV 61 for i = 0..60, bit i (weight 2^i) set
    * when sample(i+1) > sample(i), compared UNSIGNED. 60 bits keeps
    * the repo's hash60 integer-exact convention (bit 59's weight 2^59
    * never overflows a signed long) and the arithmetic is pure integer
    * compares — DuckDB renders it exactly (x91's oracle), like
    * TF.hash60. Empty payloads fingerprint to 0.
    *
    * Robustness is dHash's: uniform re-scaling, brightness-monotone
    * transforms and small local edits preserve most comparisons, so
    * near-duplicate payloads land within a few bits — the property
    * [[perceptualNearDupPairs]]' Hamming banding exploits. It lives in
    * the DECODE stage (one pass over the already-decoded bytes) where
    * a real deployment computes it over the grayscale grid; a
    * deployment swaps [[decodeStub]], not the pipeline around it.
    */
  def dhash60OfBytes(bytes: Array[Byte]): Long =
    dhashGridOfBytes(bytes, 1, 61)

  /** [[dhash60OfBytes]] generalized to a ROWS×COLS sampling grid over
    * the decoded payload (VERDICT r15 ask #6) — the shape a real image
    * dHash has: sample the payload at the rows·cols grid positions
    * ⌊j·len/(rows·cols)⌋ (row-major j), and set one bit per
    * WITHIN-ROW adjacent-intensity comparison (bit r·(cols−1)+c,
    * weight 2^bit, when sample(r,c+1) > sample(r,c), compared
    * unsigned) — rows·(cols−1) bits total, capped at 63 so the hash
    * stays integer-exact in a signed long and DuckDB renders it
    * exactly (x91b's oracle). The 1-D form is the degenerate 1×61
    * case, bit-for-bit (61 samples, 60 adjacent comparisons — the
    * x91/x21 convention, oracle-pinned).
    *
    * The ⌊⌊kx⌋/k⌋ = ⌊x⌋ upscale invariance holds for EVERY grid: a
    * nearest-neighbor ×k rendition samples upscaled[⌊j·kn/D⌋] =
    * orig[⌊⌊j·kn/D⌋/k⌋] = orig[⌊j·n/D⌋] for D = rows·cols — the
    * original's own grid point — so renditions fingerprint
    * identically whatever the grid (MultimodalSpec pins the grid form
    * too). Within-row comparisons mean a row boundary never compares
    * across semantically-unrelated samples (the property that makes
    * the 2-D form the production default for images: a vertical
    * gradient doesn't smear across scanlines). Empty payloads
    * fingerprint to 0.
    */
  def dhashGridOfBytes(bytes: Array[Byte], rows: Int, cols: Int): Long = {
    require(rows >= 1 && cols >= 2 && rows * (cols - 1) <= 63,
      s"dhash grid ${rows}x$cols needs rows>=1, cols>=2, rows*(cols-1)<=63")
    if (bytes.isEmpty) return 0L
    val d = rows.toLong * cols
    var h = 0L
    var bit = 0
    var r = 0
    while (r < rows) {
      var prev = bytes(((r.toLong * cols * bytes.length) / d).toInt) & 0xff
      var c = 1
      while (c < cols) {
        val cur = bytes((((r.toLong * cols + c) * bytes.length) / d).toInt) & 0xff
        if (cur > prev) h |= 1L << bit
        prev = cur
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

  /** The (id, ph) perceptual-fingerprint relation of a payload column
    * through the partition-batched decode seam — the kernel the
    * PERSISTED perceptual index runs once per item at create/append
    * time ([[graft.operators.PerceptualHashIndex]]), so probes never
    * re-decode. Same seam discipline as [[extractFeatures]]: per-
    * partition init (where a codec would live), items streamed, no
    * driver involvement; the fingerprint is [[dhashGridOfBytes]] at
    * the caller's grid (1×61 default = the x91 form). Null payloads
    * fingerprint like empty ones (0).
    */
  def fingerprints(df: DataFrame, payloadCol: String, idCol: String,
                   gridRows: Int = 1, gridCols: Int = 61): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        // per-partition init seam (codec handles, ONNX session, ...)
        it.map { case (id, b) =>
          (id, dhashGridOfBytes(
            if (b == null) Array.emptyByteArray else b, gridRows, gridCols))
        }
      }(out)
      .toDF(idCol, "ph")
  }

  /** The perceptual-hash bands for the candidate join: 4 bands of 15
    * bits. Pigeonhole: a pair within Hamming distance 3 differs in at
    * most 3 bits, which can dirty at most 3 of the 4 bands — the pair
    * agrees on at least one FULL band, so the union of the four band
    * equi-joins misses no qualifying pair (the x26 simhash posture,
    * proven complete against brute force in MultimodalSpec).
    */
  private val DHashBands = 4
  private val DHashBandBits = 15

  /** Perceptual NEAR-DUPLICATE candidate pairs over a fingerprint
    * relation (`idCol`, `hashCol` — [[dhash60OfBytes]] values from the
    * decode stage): the multimodal counterpart of text dedup's
    * simhash/minhash operators, the step an image-text pipeline runs
    * right after text dedup. Emits (doc_a < doc_b, ph_a, ph_b,
    * hamming) for every pair within `maxHamming` bits.
    *
    * Shape: EXACT-hash groups collapse first (the minhash
    * collapseExact theorem, verbatim: identical fingerprints carry
    * identical band keys and distance 0 to anything any member is near
    * — each group links member → group-minimum id as a STAR edge and
    * only distinct-hash representatives enter the band self-join), so
    * candidate pairs are LINEAR in duplicate-group size — mass-copied
    * images cannot go quadratic. Then the banded join: 4×15-bit band
    * keys, union of equi-joins, exact bit_count(xor) confirm — never
    * all-pairs; bucket sizes are n/2^15-ish so candidates are
    * Σ bucket², the LSH economics every dedup family here uses.
    * Clustering-exact like minhash's collapse: member-level pairs are
    * implied through representatives whose fingerprint (hence every
    * band key and distance) equals their members'.
    */
  /** @param materialize checkpoint the (id, hash, rep) frame before its
    *   two consumers (star edges + the banded rep join) — without it
    *   the whole upstream fingerprint pipeline (typically the decode
    *   mapPartitions stage) re-runs per consumer, the same trap
    *   minhashCandidates documents. DISK_ONLY: the frame is corpus-
    *   sized (three longs per item), the data-sized rule.
    */
  def perceptualNearDupPairs(fps: DataFrame, idCol: String, hashCol: String,
                             maxHamming: Long = 3L,
                             materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withRep0 = fps
      .select(col(idCol), col(hashCol).cast("long").as("ph"))
      .withColumn("rep", min(col(idCol)).over(Window.partitionBy("ph")))
    val withRep =
      if (materialize)
        withRep0.localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else withRep0
    val star = withRep.filter(col("rep") =!= col(idCol))
      .select(col("rep").as("doc_a"), col(idCol).as("doc_b"),
        col("ph").as("ph_a"), col("ph").as("ph_b"), lit(0L).as("hamming"))
    val reps = withRep.filter(col("rep") === col(idCol))
      .select(col(idCol), col("ph"))
    bandedRepPairs(reps, idCol, maxHamming).unionByName(star)
  }

  /** The banded rep-vs-rep half of [[perceptualNearDupPairs]], shared
    * with the PERSISTED index's probe: 4×15-bit band equi-joins over a
    * hash-distinct (idCol, ph) relation, exact bit_count(xor) confirm.
    */
  private def bandedRepPairs(reps: DataFrame, idCol: String,
                             maxHamming: Long): DataFrame = {
    val banded = reps.select(col(idCol), col("ph"),
        posexplode(array((0 until DHashBands).map(b =>
          shiftright(col("ph"), b * DHashBandBits)
            .bitwiseAND(lit((1L << DHashBandBits) - 1))): _*))
          .as(Seq("band", "bkey")))
    val a = banded.select(col(idCol).as("doc_a"), col("ph").as("ph_a"),
      col("band"), col("bkey"))
    val b = banded.select(col(idCol).as("doc_b"), col("ph").as("ph_b"),
      col("band").as("band_b"), col("bkey").as("bkey_b"))
    a.join(b,
        col("band") === col("band_b") && col("bkey") === col("bkey_b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ph_a", "ph_b").distinct()
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[perceptualNearDupPairs]] recomputed from a PERSISTED
    * fingerprint index's two relations instead of a fresh fingerprint
    * pass ([[graft.operators.PerceptualHashIndex]]'s probe): `fps` is
    * the doc-level (idCol, ph) relation, `reps` the hash-DISTINCT
    * kept-representative rows the index maintains — so the decode
    * stage never re-runs and the star edges come from one ph
    * equi-join instead of a window over the corpus. Pair set equals
    * the one-shot operator's whenever kept reps are the group minima
    * (create-time truth, preserved by monotone-id ingest — the same
    * caveat [[graft.llm.Dedup.foldIndexDistinct]] documents for
    * connectivity consumers, except here the rep ID is visible in the
    * pair listing; x93 pins equality against x91's oracle verbatim).
    */
  def perceptualPairsFromIndex(fps: DataFrame, reps: DataFrame,
                               idCol: String,
                               maxHamming: Long = 3L): DataFrame = {
    val star = fps.select(col(idCol), col("ph"))
      .join(reps.select(col(idCol).as("rep"), col("ph")), Seq("ph"))
      .filter(col("rep") =!= col(idCol))
      .select(col("rep").as("doc_a"), col(idCol).as("doc_b"),
        col("ph").as("ph_a"), col("ph").as("ph_b"), lit(0L).as("hamming"))
    bandedRepPairs(reps.select(col(idCol), col("ph")), idCol, maxHamming)
      .unionByName(star)
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

  /** STUB upscale — [[resizeStub]]'s other direction: nearest-neighbor
    * ×`factor` (each payload byte repeated `factor` times), the stub
    * for "the same asset ingested again at a higher resolution". The
    * point-sampled [[dhash60OfBytes]] is EXACTLY invariant under it:
    * sample i of the upscale reads upscaled[⌊i·kn/61⌋] =
    * orig[⌊⌊i·kn/61⌋/k⌋] = orig[⌊i·n/61⌋] (⌊⌊kx⌋/k⌋ = ⌊x⌋), the
    * original's own sample — so a rendition fingerprints identically
    * whatever the length, which is the property x91's fixture stands
    * on (MultimodalSpec pins it for every random length).
    */
  def upscaleStub(r: MediaRecord, factor: Int): MediaRecord = {
    require(factor >= 1, "upscale factor must be >= 1")
    val out = new Array[Byte](r.media.length * factor)
    var i = 0
    while (i < out.length) { out(i) = r.media(i / factor); i += 1 }
    r.copy(media = out)
  }

  /** Partition-batched resize over the same seam as [[extractFeatures]]. */
  def resize(ds: Dataset[MediaRecord], factor: Int,
             scale: (MediaRecord, Int) => MediaRecord = resizeStub): Dataset[MediaRecord] =
    ds.mapPartitions(_.map(scale(_, factor)))
}
