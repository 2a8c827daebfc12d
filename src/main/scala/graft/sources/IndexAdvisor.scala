package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Mount a table with EVERY persisted skipping index it has — the
  * scan-planner move a lake engine makes, composed from this repo's
  * own pieces: [[ZoneMapFileIndex]] serves range predicates on
  * CLUSTERED dimensions, [[BloomFileIndex]] serves equality/IN
  * predicates on UNCLUSTERED keys, and stacking them yields ONE
  * ordinary parquet scan whose file listing carries every index's
  * verdict at once. A mixed predicate
  * (`x BETWEEN a AND b AND doc_id IN (...)`) then opens only the
  * files BOTH indexes allow — the intersection, strictly at most
  * what either index alone would open (ComposedSkippingSpec pins
  * intersection < min(single-index survivors) on a layout built to
  * show it, and answer equality; q76 pins the ANSWER under the
  * DuckDB oracle).
  *
  * Composition is plain `FileIndex` chaining: each layer prunes the
  * listing its parent already survived, so conservatism composes too
  * — a file unknown to (or rewritten under) ANY layer is scanned
  * unless some OTHER layer proves it empty, and a predicate neither
  * index serves prunes nothing. `PushedFilters` stay intact (the
  * layers only shrink the listing), Catalyst/AQE see one normal
  * relation, and the whole stack costs what its layers cost: a KB
  * zone-map load plus one executor-side bloom probe job per filter
  * set.
  */
object IndexAdvisor {

  /** One optional layer per index kind; extend as new kinds land. */
  final case class Indexes(
      zoneMap: Option[(String, Set[String])] = None, // (zmPath, dims)
      bloom: Option[(String, String)] = None)        // (bloomPath, column)

  def read(spark: SparkSession, tablePath: String,
           indexes: Indexes): DataFrame =
    readWithIndexes(spark, tablePath, indexes)._1

  /** [[read]] plus the outermost index instance (for skip counts). */
  def readWithIndexes(spark: SparkSession, tablePath: String,
                      indexes: Indexes): (DataFrame, FileIndex) = {
    require(indexes.zoneMap.isDefined || indexes.bloom.isDefined,
      "IndexAdvisor.read needs at least one index; use spark.read.parquet otherwise")
    // zone map innermost (its KB-scale stats prune before the bloom
    // layer pays its probe job on the survivors' behalf — the cheap
    // verdict first, the same order a lake planner evaluates stats)
    val zoned: Option[FileIndex] = indexes.zoneMap.map { case (zm, dims) =>
      new ZoneMapFileIndex(spark, tablePath, zm, dims)
    }
    val idx: FileIndex = indexes.bloom match {
      case Some((bm, col)) =>
        new BloomFileIndex(spark, tablePath, bm, col, parent = zoned)
      case None => zoned.get
    }
    val schema = spark.read.parquet(tablePath).schema
    val rel = HadoopFsRelation(
      idx,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    (spark.baseRelationToDataFrame(rel), idx)
  }
}
