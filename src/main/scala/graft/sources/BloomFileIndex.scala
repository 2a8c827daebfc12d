package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StructType}

/** Planning-time BLOOM file skipping — [[graft.operators.FileBloom]]'s
  * per-file filters consulted INSIDE the scan node's own file listing,
  * the point-probe twin of [[ZoneMapFileIndex]]: zone maps serve range
  * predicates on CLUSTERED dimensions, this serves equality/IN
  * predicates on UNCLUSTERED high-cardinality keys, and both wear the
  * Delta/Iceberg data-skipping posture — one ordinary parquet
  * `HadoopFsRelation`, `PushedFilters` intact, Catalyst/AQE free to
  * reorder or broadcast around it, the skip visible in the scan's own
  * numFiles metric (BloomPlanningSpec pins it).
  *
  * `FileSourceScanExec` hands [[listFiles]] the scan's data filters;
  * equality and IN predicates on the indexed column become key sets,
  * and a file survives when — for EVERY such conjunct — at least one
  * of its keys MIGHT be in the file's bloom. The test itself runs
  * EXECUTOR-side: a Spark job over the index parquet folds the same
  * membership expression the driver probe path uses and collects only
  * the (name, length, mtime) of provably-empty files, so the driver
  * never holds a bitset — at 100k files × 32 KB filters that is the
  * difference between 3.2 GB resident and a list of names (VERDICT
  * r10 ask #1). Skipping stays a performance act: a file is only
  * dropped when a filter row matching its LIVE (length, mtime)
  * fingerprint proves no key can be present (a bloom "no" is never
  * wrong), unknown files (landed since the index was maintained) and
  * rewritten-in-place files (stale rows only) are always scanned, and
  * non-extractable predicates contribute nothing. Key hashing never
  * diverges from the build: positions come from evaluating the SAME
  * `xxhash64` expression tree over the key literal
  * ([[graft.operators.FileBloom.positionsOf]]); a literal whose type
  * was widened by the analyzer (`Cast(key AS BIGINT) = 5L`) is
  * narrowed back to the column's own type when lossless, else the
  * conjunct is ignored.
  */
final class BloomFileIndex(spark: SparkSession, tablePath: String,
                           bloomPath: String, column: String,
                           parent: Option[FileIndex] = None)
    extends FileIndex {

  // indexes STACK: with a parent, this layer prunes whatever listing
  // the parent (another skipping index) already survived — one scan
  // node, every index's verdict (IndexAdvisor composes the chain)
  private val base = parent.getOrElse(
    new InMemoryFileIndex(spark, Seq(new Path(tablePath)), Map.empty, None))

  /** Only the index's (m, k) configuration crosses the driver at
    * construction — the per-file bitsets (m/8 bytes each, 3.2 GB
    * resident at 100k files × 32 KB) stay EXECUTOR-side: each probe
    * folds the membership test into a Spark job over the index
    * parquet and collects only the names of provably-empty files
    * (VERDICT r10 ask #1).
    */
  private val (m: Int, k: Int) = {
    val mk = spark.read.parquet(bloomPath).select("m", "k").distinct().collect()
    require(mk.nonEmpty, s"empty bloom index at $bloomPath")
    require(mk.length == 1,
      s"bloom index at $bloomPath mixes (m,k) configurations: ${mk.mkString(",")}")
    (mk(0).getInt(0), mk(0).getInt(1))
  }

  /** Per-filter-set cache of the PRUNABLE map: canonical path →
    * fingerprints of the index rows proving absence. AQE re-lists the
    * same scan several times while re-planning; the probe job runs
    * once per distinct position-set. Entries are file names and two
    * longs — never bitsets — and the cache is BOUNDED: a long-lived
    * index instance probed with ever-changing literals (a lookup
    * service) must not accumulate one prunable list per key ever
    * seen, so insertion past [[BloomFileIndex.PruneCacheMax]] evicts
    * in insertion order (the access pattern is "same filter set
    * re-listed a few times in quick succession by one query", which
    * FIFO serves as well as LRU without a lock on reads).
    */
  private val pruneCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Seq[Seq[Seq[Int]]], Map[String, Set[(Long, Long)]]]() {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Seq[Seq[Seq[Int]]], Map[String, Set[(Long, Long)]]]): Boolean =
          size() > BloomFileIndex.PruneCacheMax
      })

  private[sources] def pruneCacheSize: Int = pruneCache.size()

  // the probe job runs OUTSIDE any lock (a Spark job must never run
  // under a monitor other threads contend); a concurrent duplicate
  // computation of the same filter set is idempotent and harmless
  private def prunable(posSets: Seq[Seq[Seq[Int]]]): Map[String, Set[(Long, Long)]] = {
    val hit = pruneCache.get(posSets)
    if (hit != null) hit
    else {
      val m = BloomFileIndex.pruneJob(spark, bloomPath, posSets).collect()
        .groupBy(r => new Path(r.getString(0)).toUri.getPath)
        .map { case (p, rs) =>
          p -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
        }
      pruneCache.put(posSets, m)
      m
    }
  }

  override def rootPaths: Seq[Path] = base.rootPaths
  override def partitionSchema: StructType = base.partitionSchema
  override def sizeInBytes: Long = base.sizeInBytes
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = {
    base.refresh()
    // refresh = "metadata changed": drop cached prunable lists so the
    // next listing re-probes a possibly-maintained index (stale cache
    // entries were only ever a missed-pruning, never a wrong answer —
    // a fresh fingerprint can't match an old failing set)
    pruneCache.clear()
  }

  /** (surviving, listed) counts of the most recent [[listFiles]] call
    * — the observability hook the spec and scale smoke read (AQE
    * clones scan nodes, so plan-metric accumulators are unreliable
    * from the caller's side).
    */
  @volatile private var lastSkipCounts: Option[(Int, Int)] = None
  def lastListing: Option[(Int, Int)] = lastSkipCounts

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keySets = BloomFileIndex.extractKeySets(dataFilters, column)
    val posSets: Seq[Seq[Seq[Int]]] = keySets.map(_.map(l =>
      graft.operators.FileBloom.positionsOf(GraftSqlShims.toColumn(l), m, k)))
    val listed = base.listFiles(partitionFilters, dataFilters)
    val pruned =
      if (posSets.isEmpty) listed
      else {
        val failing = prunable(posSets)
        // a listed file is dropped only when an index row proving "no
        // probed key can be present" matches the file's LIVE (length,
        // mtime) fingerprint: unknown files (no row) and rewritten
        // files (stale rows only) always scan — VERDICT r10 ask #2
        listed.map { pd =>
          pd.copy(files = pd.files.filter(f =>
            !failing.get(f.getPath.toUri.getPath)
              .exists(_.contains((f.getLen, f.getModificationTime)))))
        }
      }
    lastSkipCounts = Some((pruned.map(_.files.size).sum,
      listed.map(_.files.size).sum))
    pruned
  }
}

object BloomFileIndex {

  /** Max distinct filter sets whose prunable lists one index instance
    * retains (FIFO eviction past this). Each entry is bounded by the
    * prunable file-name list, so the cache ceiling is
    * PruneCacheMax × files × ~100 B.
    */
  private[sources] val PruneCacheMax = 64

  /** The executor-side probe: one Spark job over the index parquet
    * evaluating the SAME membership test the driver probe path folds
    * ([[graft.operators.FileBloom.prunedFiles]]'s expression), keeping
    * only rows that prove NO probed key can be present. Its output —
    * what [[BloomFileIndex]] collects — is (file, flen, fmtime): file
    * names and two longs, never bitsets, so driver residency is flat
    * in file count (BloomPlanningSpec pins the collected schema).
    */
  private[sources] def pruneJob(spark: SparkSession, bloomPath: String,
                                posSets: Seq[Seq[Seq[Int]]]): DataFrame = {
    val mightAll = posSets.map(ks =>
        ks.map(ps => graft.operators.FileBloom.mightContain(ps)).reduce(_ || _))
      .reduce(_ && _)
    spark.read.parquet(bloomPath).filter(!mightAll)
      .select("file", "flen", "fmtime").distinct()
  }

  /** Mount `tablePath` as a DataFrame whose scan consults the bloom
    * index at `bloomPath` during file listing. A plain parquet
    * relation in every other respect.
    */
  def read(spark: SparkSession, tablePath: String, bloomPath: String,
           column: String): DataFrame =
    readWithIndex(spark, tablePath, bloomPath, column)._1

  /** [[read]] plus the index instance, for callers that want the
    * [[BloomFileIndex.lastListing]] skip counts after running.
    */
  def readWithIndex(spark: SparkSession, tablePath: String, bloomPath: String,
                    column: String): (DataFrame, BloomFileIndex) = {
    val schema = spark.read.parquet(tablePath).schema
    val index = new BloomFileIndex(spark, tablePath, bloomPath, column)
    val rel = HadoopFsRelation(
      index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    (spark.baseRelationToDataFrame(rel), index)
  }

  /** One key set per extractable conjunct on `column`: equality and
    * IN shapes whose literals carry (or losslessly narrow to) the
    * column's own type. Conservative: anything else contributes
    * nothing — the file is scanned.
    */
  private[sources] def extractKeySets(filters: Seq[Expression],
                                      column: String): Seq[Seq[Literal]] = {
    val sets = scala.collection.mutable.ArrayBuffer.empty[Seq[Literal]]

    // the indexed attribute, possibly under an analyzer-inserted
    // integral WIDENING cast; returns the attribute's own type. A
    // narrowing cast (cast(longCol AS INT) = 5) is NOT transparent:
    // under non-ANSI semantics it matches column values by modular
    // arithmetic, so narrowing the literal back and hashing it would
    // wrongly prune the file holding x = 2^32 + 5 — the lossless
    // check in `narrowed` guards the LITERAL, this guards the COLUMN
    // (ADVICE r10).
    def intWidth(dt: DataType): Int = dt match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 4
      case LongType => 8
      case _ => 0 // non-integral: never transparent under a cast
    }
    def attrType(e: Expression): Option[DataType] = e match {
      case a: Attribute if a.name == column => Some(a.dataType)
      case Cast(a: Attribute, t @ (ByteType | ShortType | IntegerType | LongType), _, _)
          if a.name == column && intWidth(a.dataType) > 0 &&
            intWidth(t) >= intWidth(a.dataType) => Some(a.dataType)
      case _ => None
    }

    // a literal re-expressed in the column's own type, when lossless
    def narrowed(value: Any, lt: DataType, target: DataType): Option[Literal] = {
      if (value == null) return None
      if (lt == target) return Some(Literal(value, lt))
      val asLong: Option[Long] = value match {
        case b: Byte => Some(b.toLong)
        case s: Short => Some(s.toLong)
        case i: Int => Some(i.toLong)
        case l: Long => Some(l)
        case _ => None
      }
      asLong.flatMap { v =>
        target match {
          case ByteType if v.isValidByte => Some(Literal(v.toByte, ByteType))
          case ShortType if v.isValidShort => Some(Literal(v.toShort, ShortType))
          case IntegerType if v.isValidInt => Some(Literal(v.toInt, IntegerType))
          case LongType => Some(Literal(v, LongType))
          case _ => None
        }
      }
    }

    def keyOf(a: Expression, l: Literal): Option[Literal] =
      attrType(a).flatMap(t => narrowed(l.value, l.dataType, t))

    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, l: Literal) => keyOf(a, l).foreach(k => sets += Seq(k))
      case EqualTo(l: Literal, a) => keyOf(a, l).foreach(k => sets += Seq(k))
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attrType(a).foreach { t =>
          val ks = vs.map(v => narrowed(v.asInstanceOf[Literal].value,
            v.dataType, t))
          // all-or-nothing: a key we cannot hash could be the one
          // present, so a partial set must not prune
          if (ks.forall(_.isDefined)) sets += ks.map(_.get)
        }
      case InSet(a, hset) =>
        attrType(a).foreach { t =>
          val lt = a.dataType // values are stored in the CAST side's type
          val ks = hset.toSeq.map(v => narrowed(v, lt, t))
          if (ks.forall(_.isDefined)) sets += ks.map(_.get)
        }
      case _ => ()
    }
    filters.foreach(walk)
    sets.toSeq
  }
}
