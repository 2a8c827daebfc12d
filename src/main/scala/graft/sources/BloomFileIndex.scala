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
  * of its keys MIGHT be in the file's bloom. Skipping stays a
  * performance act: a file is only dropped when its filter proves no
  * key can be present (a bloom "no" is never wrong), unknown files
  * (landed since the index was maintained) are always scanned, and
  * non-extractable predicates contribute nothing. Key hashing never
  * diverges from the build: positions come from evaluating the SAME
  * `xxhash64` expression tree over the key literal
  * ([[graft.operators.FileBloom.positionsOf]]); a literal whose type
  * was widened by the analyzer (`Cast(key AS BIGINT) = 5L`) is
  * narrowed back to the column's own type when lossless, else the
  * conjunct is ignored.
  */
final class BloomFileIndex(spark: SparkSession, tablePath: String,
                           bloomPath: String, column: String)
    extends FileIndex {

  private val base =
    new InMemoryFileIndex(spark, Seq(new Path(tablePath)), Map.empty, None)

  /** path-part → packed bloom words; plus the index's (m, k). */
  private val (blooms: Map[String, Array[Long]], m: Int, k: Int) = {
    val rows = spark.read.parquet(bloomPath)
      .select("file", "m", "k", "words").collect()
    require(rows.nonEmpty, s"empty bloom index at $bloomPath")
    val mks = rows.map(r => (r.getInt(1), r.getInt(2))).distinct
    require(mks.length == 1,
      s"bloom index at $bloomPath mixes (m,k) configurations: ${mks.mkString(",")}")
    val byFile = rows.map { r =>
      new Path(r.getString(0)).toUri.getPath ->
        r.getSeq[Long](3).toArray
    }.toMap
    (byFile, mks(0)._1, mks(0)._2)
  }

  override def rootPaths: Seq[Path] = base.rootPaths
  override def partitionSchema: StructType = base.partitionSchema
  override def sizeInBytes: Long = base.sizeInBytes
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = base.refresh()

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
      else listed.map { pd =>
        pd.copy(files = pd.files.filter(f =>
          survives(f.getPath.toUri.getPath, posSets)))
      }
    lastSkipCounts = Some((pruned.map(_.files.size).sum,
      listed.map(_.files.size).sum))
    pruned
  }

  private def survives(path: String, posSets: Seq[Seq[Seq[Int]]]): Boolean =
    blooms.get(path) match {
      case None => true // no filter row: never prune what we can't prove
      case Some(words) => posSets.forall(_.exists(_.forall(p =>
        (words(p / 64) & (1L << (p % 64))) != 0L)))
    }
}

object BloomFileIndex {

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
