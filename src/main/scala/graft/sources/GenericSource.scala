package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform read/write surface over the formats the engine supports
  * (SURVEY.md §2.2 sources row): parquet, orc, csv, json, line text.
  *
  * Reads always take an EXPLICIT schema: schema inference costs an
  * extra full pass over csv/json at scale and can silently drift
  * between runs (the reference's schema-on-read parquet habit,
  * hha.py:304, pinned down per SURVEY §1.4). Writers default to
  * snappy parquet — the only format to use for anything that gets
  * read again.
  */
object GenericSource {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Orc extends Format { val name = "orc" }
  case object Csv extends Format { val name = "csv" }
  case object Json extends Format { val name = "json" }

  /** One string column per line — raw-document ingestion (the first
    * hop of a text-corpus pipeline, before any schema exists). Reads
    * as a single `value STRING` column; writes require exactly one
    * string column. Splittable like csv/json-lines.
    */
  case object Text extends Format { val name = "text" }

  /** Spark 4's built-in XML source (rowTag-delimited records; the
    * `rowTag` option defaults to "row" here and is shared by read and
    * write so round-trips need no ceremony). Schema-pinned like csv/
    * json — XML inference is an extra full pass AND type-guessy, the
    * worst of both. For interchange only; anything read twice belongs
    * in parquet.
    */
  case object Xml extends Format { val name = "xml" }

  /** Schema-pinned read. csv expects a header by default (matched by
    * [[write]]); json is line-delimited (the only splittable layout).
    */
  def read(spark: SparkSession, format: Format, path: String, schema: StructType,
           options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.schema(schema).options(options)
    format match {
      case Parquet => base.parquet(path)
      case Orc => base.orc(path)
      case Csv => base.option("header", options.getOrElse("header", "true")).csv(path)
      case Json => base.json(path)
      case Text => base.text(path)
      case Xml => base.option("rowTag", options.getOrElse("rowTag", "row")).xml(path)
    }
  }

  /** Write with sized output files: `targetPartitions` caps the file
    * count so a small frame doesn't shatter into per-task confetti
    * and a big one still parallelizes (at 100 TB you tune this to
    * ~128 MB-1 GB per file; repartition(1) driver-funnels are the
    * anti-pattern this knob replaces).
    *
    * `partitionBy` lays the output out hive-style (`col=value/` dirs):
    * the single most important 100 TB read optimization — a filter on
    * a partition column prunes whole directories at planning time
    * (PartitionFilters in the scan, proven in GenericSourceSpec), so a
    * day/language/source-scoped query reads that slice and nothing
    * else. Partition columns should be low-cardinality (day, lang,
    * source); high-cardinality values shatter the layout into tiny
    * files.
    */
  def write(df: DataFrame, format: Format, path: String,
            mode: SaveMode = SaveMode.Overwrite,
            targetPartitions: Option[Int] = None,
            partitionBy: Seq[String] = Nil,
            options: Map[String, String] = Map.empty): Unit = {
    val sized = targetPartitions.fold(df)(n => df.coalesce(n))
    val parted =
      if (partitionBy.isEmpty) sized.write
      else sized.write.partitionBy(partitionBy: _*)
    val base = parted.mode(mode).options(options)
    format match {
      case Parquet => base.parquet(path)
      case Orc => base.orc(path)
      case Csv => base.option("header", options.getOrElse("header", "true")).csv(path)
      case Json => base.json(path)
      case Text => base.text(path)
      case Xml => base.option("rowTag", options.getOrElse("rowTag", "row")).xml(path)
    }
  }

  /** Bucketed (and optionally sorted) parquet table write — the layout
    * that makes repeated joins on `keys` exchange-free and, with
    * `sortCols`, lets sort-dependent operators (sort-merge join, the
    * native as-of join) skip their per-side sort too (proven on the
    * plan in BucketingSpec / AsOfJoinNativeSpec). Catalog-table-based
    * because bucket metadata lives in the metastore; readers use
    * `spark.table(table)`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one bucket key")
    val w = df.write.mode(mode).bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted = if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    // appends to an EXISTING table (DedupIndex.append) inherit its
    // location — passing a path there would shadow the metastore's
    val located = if (path == null) sorted else sorted.option("path", path)
    located.saveAsTable(table)
  }

  /** Schema-evolution read: parquet/orc written over time with ADDED
    * columns reads as the union schema (absent columns null-fill).
    * This is the footer-merge path (`mergeSchema`) — it reads every
    * file's footer at planning time, so at 100 TB you either pin the
    * expected union schema explicitly via [[read]] (zero extra I/O)
    * or pay one planning pass here when the union is genuinely
    * unknown. csv/json evolve by pinned schema only.
    */
  def readMerged(spark: SparkSession, format: Format, path: String): DataFrame =
    format match {
      case Parquet => spark.read.option("mergeSchema", "true").parquet(path)
      case Orc => spark.read.option("mergeSchema", "true").orc(path)
      case f => throw new IllegalArgumentException(
        s"mergeSchema applies to parquet/orc, not ${f.name}")
    }

  /** Small-files compaction — the maintenance pass every long-lived
    * ingest layout needs: streaming sinks and per-batch appends leave
    * thousands of KB-sized files, and at scale the NameNode/listing
    * pressure plus per-file task overhead dominate reads. Rewrites
    * `inPath` to `outPath` with file count = min(ceil(bytes /
    * targetFileBytes), scan partitions) (floor 1) — coalesce can
    * MERGE partitions but never split them, so a directory of a few
    * oversized files stays at its scan-partition count rather than
    * being shuffled apart (splitting a monolith is a repartition job,
    * not compaction). Returns the count actually written. Distinct
    * paths because an in-place overwrite of a live directory isn't
    * atomic on object stores; no shuffle by construction.
    */
  def compact(spark: SparkSession, format: Format, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20): Long = {
    require(inPath != outPath, "compact writes to a NEW path (non-atomic overwrite)")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val target = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = format match {
      case Parquet => spark.read.parquet(inPath)
      case Orc => spark.read.orc(inPath)
      case f => throw new IllegalArgumentException(
        s"compact self-describing columnar data (parquet/orc), not ${f.name}")
    }
    val nFiles = math.min(target, df.rdd.getNumPartitions.toLong.max(1L)).toInt
    write(df.coalesce(nFiles), format, outPath)
    nFiles.toLong
  }

  /** Raw binary ingestion — the first hop of a MULTIMODAL pipeline:
    * every file under `path` (optionally glob-filtered) becomes one
    * row of (path, modificationTime, length, content BINARY), the
    * shape [[graft.llm.Multimodal]] consumes (opaque payload + typed
    * metadata). Spark's binaryFile source; files are not splittable
    * (one file = one row), so parallelism = file count — fine for
    * media corpora, wrong for a few giant archives (shard those
    * upstream). `maxLength` guards the executor heap: oversized files
    * are SKIPPED via a pushed-down filter on the source's `length`
    * metadata column (binaryFile supports length/path/modTime
    * pushdown, so skipped files' content is never loaded). A filter,
    * not the global `binaryFile.maxLength` conf — the conf mutates
    * shared session state, leaking the cap into every other
    * binaryFile read and racing with lazy execution of earlier frames
    * (review finding).
    */
  def readBinary(spark: SparkSession, path: String,
                 pathGlobFilter: Option[String] = None,
                 maxLength: Option[Long] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    val globbed = pathGlobFilter.fold(base)(g => base.option("pathGlobFilter", g))
    val df = globbed.load(path)
    maxLength.fold(df)(m =>
      df.filter(org.apache.spark.sql.functions.col("length") <= m))
  }
}
