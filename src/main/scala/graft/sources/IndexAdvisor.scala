package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftshim.GraftSqlShims
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

  // ---- the table→indexes CATALOG (VERDICT r11 ask #6) -------------

  /** One registered index: which kind, where its stats live, which
    * table columns it serves.
    */
  final case class CatalogEntry(kind: String, path: String,
                                columns: Seq[String])

  /** The catalog lives as a tiny parquet relation UNDER the table dir
    * — `_`-prefixed, so every data listing (Spark's own, and
    * IndexStat.liveStatus) already excludes it, the same place a lake
    * format keeps `_delta_log`. One row per registered index.
    */
  private def catalogPath(tablePath: String): String =
    s"$tablePath/_graft_indexes"

  /** Record that `indexPath` holds a `kind` index over `columns` of
    * the table — the one-time registration a deployment does when it
    * builds an index, so QUERIES never need to know index paths.
    * Idempotent: re-registering an identical entry folds away on
    * read.
    */
  def register(spark: SparkSession, tablePath: String, kind: String,
               indexPath: String, columns: Seq[String]): Unit = {
    require(kind == "zonemap" || kind == "bloom",
      s"unknown index kind '$kind' (zonemap | bloom)")
    val spark2 = spark; import spark2.implicits._
    Seq((kind, indexPath, columns)).toDF("kind", "path", "columns")
      .coalesce(1).write.mode("append").parquet(catalogPath(tablePath))
  }

  /** The table's registered indexes (empty when no catalog exists). */
  def catalog(spark: SparkSession, tablePath: String): Seq[CatalogEntry] = {
    val p = new org.apache.hadoop.fs.Path(catalogPath(tablePath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else spark.read.parquet(catalogPath(tablePath))
      .select("kind", "path", "columns").distinct()
      .collect()
      .map(r => CatalogEntry(r.getString(0), r.getString(1), r.getSeq[String](2)))
      .sortBy(e => (e.kind, e.path)).toSeq
  }

  /** Column names a predicate references (case-insensitive), before
    * resolution — the shape the advisor selects layers by.
    */
  private def referenced(pred: Column): Set[String] =
    GraftSqlShims.toExpression(pred).collect {
      case a: UnresolvedAttribute => a.name.toLowerCase
      case a: AttributeReference => a.name.toLowerCase
    }.toSet

  /** Scan the table through whatever registered indexes SERVE this
    * predicate — the full advisor: the caller states WHAT it filters,
    * the catalog knows what indexes exist, and the advisor mounts
    * only layers whose column the predicate references (a layer that
    * can't prune would only cost its probe). No serving layer → a
    * plain parquet scan, so an unserved predicate costs exactly what
    * it would without the advisor. The predicate is applied on top in
    * full — index pruning remains a performance act, never a
    * correctness one (q76 runs this path under the DuckDB oracle).
    */
  def readDiscovered(spark: SparkSession, tablePath: String,
                     predicate: Column): DataFrame =
    readDiscoveredWithIndexes(spark, tablePath, predicate)._1

  /** [[readDiscovered]] plus the mounted outermost index (None when
    * the predicate serves no layer and the scan is plain).
    */
  def readDiscoveredWithIndexes(spark: SparkSession, tablePath: String,
                                predicate: Column): (DataFrame, Option[FileIndex]) = {
    val cols = referenced(predicate)
    val serving = catalog(spark, tablePath)
      .filter(_.columns.exists(c => cols(c.toLowerCase)))
    // one layer per kind; among same-kind candidates take the one
    // serving the most referenced columns (ties → path order, which
    // catalog() already sorted deterministically)
    def pick(kind: String): Option[CatalogEntry] =
      serving.filter(_.kind == kind)
        .sortBy(e => -e.columns.count(c => cols(c.toLowerCase)))
        .headOption
    val (zm, bloom) = (pick("zonemap"), pick("bloom"))
    if (zm.isEmpty && bloom.isEmpty)
      (spark.read.parquet(tablePath).filter(predicate), None)
    else {
      val (df, idx) = readWithIndexes(spark, tablePath, Indexes(
        zoneMap = zm.map(e => (e.path, e.columns.toSet)),
        bloom = bloom.map(e => (e.path, e.columns.head))))
      (df.filter(predicate), Some(idx))
    }
  }
}
