package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.{ZOrder, ZoneMap}

/** The planning-time zone-map index must (a) skip files inside the
  * scan node itself — the `numFiles` metric, not a hand-built path
  * list, is the witness — (b) keep the predicate pushed to parquet,
  * and (c) never change an answer: skipping is a performance act.
  */
class ZoneMapPlanningSpec extends AnyFunSuite with SparkTestSession {

  private val D = "/root/testdata/sf0.001"
  private val dims = Seq("l_partkey", "l_suppkey")

  private lazy val layout: (String, String) = {
    val root = graft.core.Scratch.dir("zonemap_planning")
    val table = s"$root/li_z"
    val zm = s"$root/li_zm"
    ZOrder.writeZOrdered(
      spark.read.parquet(s"$D/lineitem.parquet"),
      table, dims, bits = 10, files = 16)
    ZoneMap.build(spark, table, dims, zm)
    (table, zm)
  }

  private def scanMetrics(df: DataFrame): (Long, Long) = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1, "expected exactly one file scan")
    (scans.head.metrics("numFiles").value,
      scans.head.relation.location.inputFiles.length.toLong)
  }

  test("bounded probe scans fewer files than the table holds") {
    val (table, zm) = layout
    val df = ZoneMapFileIndex.read(spark, table, zm, dims.toSet)
      .filter(col("l_partkey").between(10, 40) && col("l_suppkey") <= 5)
    val (scanned, total) = scanMetrics(df)
    assert(total >= 8, s"layout produced only $total files")
    assert(scanned < total, s"no files skipped: scanned $scanned of $total")
    assert(scanned > 0, "box matches data; some file must survive")
  }

  test("the skipping scan's answer equals the plain reader's") {
    val (table, zm) = layout
    def probe(df: DataFrame): Set[String] = df
      .filter(col("l_partkey").between(10, 40) && col("l_suppkey") <= 5)
      .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")))
      .collect().map(_.getString(0)).toSet
    val plain = probe(spark.read.parquet(table))
    assert(plain.nonEmpty)
    assert(probe(ZoneMapFileIndex.read(spark, table, zm, dims.toSet)) === plain)
  }

  test("predicates stay pushed to the parquet reader") {
    val (table, zm) = layout
    val df = ZoneMapFileIndex.read(spark, table, zm, dims.toSet)
      .filter(col("l_partkey").between(10, 40))
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("l_partkey"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
  }

  test("a predicate outside the mapped dims scans every file") {
    val (table, zm) = layout
    val df = ZoneMapFileIndex.read(spark, table, zm, dims.toSet)
      .filter(col("l_orderkey") > 0)
    val (scanned, total) = scanMetrics(df)
    assert(scanned === total, "unmapped predicate must not skip anything")
  }

  test("skip counts stay visible through an AQE-wrapped aggregate") {
    // AQE clones scan nodes, so the caller's plan object can't reach
    // the executed metrics; the index's own listing hook can.
    val (table, zm) = layout
    val (df, idx) = ZoneMapFileIndex.readWithIndex(spark, table, zm, dims.toSet)
    df.filter(col("l_partkey").between(10, 40) && col("l_suppkey") <= 5)
      .agg(count(lit(1))).head()
    val (surv, listed) = idx.lastListing.getOrElse(fail("listFiles never ran"))
    assert(surv > 0 && surv < listed, s"no skip recorded: $surv of $listed")
  }

  test("extractBounds intersects conjuncts and relaxes strict bounds") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    val a = Symbol("l_partkey").long
    val bounds = ZoneMapFileIndex.extractBounds(
      Seq(a >= 10L, a <= 40L, a > 12L), Set("l_partkey"))
    // > 12 relaxes to >= 12; intersection takes the max of the lows
    assert(bounds === Map("l_partkey" -> (12L, 40L)))
    assert(ZoneMapFileIndex.extractBounds(Seq(a.isNotNull), Set("l_partkey")).isEmpty)
  }

  test("a NARROWING cast on the dim is never looked through") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    // cast(longCol AS INT) = 5 matches by MODULAR arithmetic under
    // non-ANSI semantics (x = 2^32 + 5 also satisfies it), so testing
    // the column's raw long min/max against 5 would wrongly prune the
    // file holding the wrapped value — no bound (ADVICE r10)
    val long = Symbol("l_partkey").long
    assert(ZoneMapFileIndex.extractBounds(
      Seq(EqualTo(Cast(long, IntegerType), Literal(5))), Set("l_partkey")).isEmpty)
    // widening casts (the analyzer's own shape) still contribute
    val int = Symbol("l_partkey").int
    assert(ZoneMapFileIndex.extractBounds(
      Seq(EqualTo(Cast(int, LongType), Literal(5L))), Set("l_partkey")) ===
      Map("l_partkey" -> (5L, 5L)))
    // a cast on a non-integral column is equally opaque
    val str = Symbol("l_partkey").string
    assert(ZoneMapFileIndex.extractBounds(
      Seq(EqualTo(Cast(str, IntegerType), Literal(5))), Set("l_partkey")).isEmpty)
  }
}
