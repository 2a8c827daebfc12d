package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.ZoneMap.Range

/** File-level zone-map skipping over a z-ordered layout: the probe
  * must open strictly fewer files than the table holds (that is the
  * operator's whole point) while producing exactly the full-scan
  * answer, and an impossible box must short-circuit to empty without
  * touching data files.
  */
class ZoneMapSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"

  private lazy val layout: (String, String) = {
    val root = graft.core.Scratch.dir("zonemap_spec")
    val table = s"$root/li_z"
    val zm = s"$root/li_zm"
    ZOrder.writeZOrdered(
      spark.read.parquet(s"$D/lineitem.parquet"),
      table, Seq("l_partkey", "l_suppkey"), bits = 10, files = 16)
    ZoneMap.build(spark, table, Seq("l_partkey", "l_suppkey"), zm)
    (table, zm)
  }

  private val box = Seq(Range("l_partkey", 10, 40), Range("l_suppkey", 1, 5))

  test("probe opens fewer files than the table holds") {
    val (table, zm) = layout
    val total = ZoneMap.fileCount(spark, zm)
    val kept = ZoneMap.prunedFiles(spark, zm, box).size
    assert(total >= 8, s"layout produced only $total files")
    assert(kept < total, s"no files skipped: kept $kept of $total")
    assert(kept > 0, "box matches data; candidate set must be non-empty")
  }

  test("pruned read equals the full-scan answer") {
    val (table, zm) = layout
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))).collect().map(_.getString(0)).toSet
    val full = key(spark.read.parquet(table).filter(ZoneMap.boxPredicate(box)))
    val pruned = key(ZoneMap.readPruned(spark, table, zm, box))
    assert(full.nonEmpty)
    assert(pruned == full)
  }

  test("incremental appendStats equals a from-scratch build") {
    val root = graft.core.Scratch.dir("zonemap_incr")
    val table = s"$root/t"
    val li = spark.read.parquet(s"$D/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    // two landings, as a maintenance loop would see them
    val incr = s"$root/zm_incr"
    val halves = Seq(li.filter(col("l_partkey") % 2 === 0),
      li.filter(col("l_partkey") % 2 === 1))
    halves.foreach { h =>
      val before = ZoneMap.dataFiles(spark, table).toSet
      h.coalesce(2).write.mode("append").parquet(table)
      val landed = ZoneMap.dataFiles(spark, table).filterNot(before)
      assert(landed.nonEmpty)
      ZoneMap.appendStats(spark, landed, Seq("l_partkey", "l_suppkey"), incr)
    }
    val scratch = s"$root/zm_full"
    ZoneMap.build(spark, table, Seq("l_partkey", "l_suppkey"), scratch)
    def rows(p: String): Set[String] =
      spark.read.parquet(p).collect().map(_.mkString("|")).toSet
    assert(rows(incr) == rows(scratch))

    // the LSM lifecycle verb: two appends left >= 2 stats files;
    // compaction folds to one with identical rows
    assert(ZoneMap.dataFiles(spark, incr).size >= 2)
    val beforeRows = rows(incr)
    ZoneMap.compactStats(spark, incr)
    assert(ZoneMap.dataFiles(spark, incr).size == 1,
      "compaction must leave exactly one stats file")
    assert(rows(incr) == beforeRows, "compaction changed the map's rows")
  }

  test("a replayed append never changes a probe answer") {
    // foreachBatch maintenance is at-least-once: after recovery a
    // batch can re-append the same files' stats rows. The read path
    // must not open a file twice for it, and compaction must fold
    // the duplicates away.
    val root = graft.core.Scratch.dir("zonemap_replay")
    val table = s"$root/t"
    val zm = s"$root/zm"
    val dims = Seq("l_partkey", "l_suppkey")
    spark.read.parquet(s"$D/lineitem.parquet").select(dims.map(col): _*)
      .coalesce(3).write.parquet(table)
    val files = ZoneMap.dataFiles(spark, table)
    ZoneMap.appendStats(spark, files, dims, zm)
    val box = Seq(Range("l_partkey", 1, 50))
    val once = ZoneMap.readPruned(spark, table, zm, box).count()
    assert(once > 0)
    ZoneMap.appendStats(spark, files, dims, zm) // the replay
    assert(ZoneMap.readPruned(spark, table, zm, box).count() === once,
      "duplicate stats rows must not duplicate answer rows")
    ZoneMap.compactStats(spark, zm)
    assert(spark.read.parquet(zm).count() === files.size,
      "compaction must fold replayed rows to one per file")
    assert(ZoneMap.readPruned(spark, table, zm, box).count() === once)
  }

  test("a box outside every zone short-circuits to empty") {
    val (table, zm) = layout
    val none = Seq(Range("l_partkey", -100, -1))
    assert(ZoneMap.prunedFiles(spark, zm, none).isEmpty)
    val out = ZoneMap.readPruned(spark, table, zm, none)
    assert(out.count() == 0)
    assert(out.schema == spark.read.parquet(table).schema)
  }
}
