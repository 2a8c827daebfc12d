package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.FileBloom

/** The planning-time bloom index must (a) skip files inside the scan
  * node itself on equality/IN probes over an UNCLUSTERED column — the
  * case zone maps cannot serve — (b) keep the predicate pushed to
  * parquet, (c) never change an answer, and (d) stay conservative:
  * unknown files and non-extractable predicates are always scanned.
  */
class BloomPlanningSpec extends AnyFunSuite with SparkTestSession {

  private lazy val layout: (String, String) = {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("bloom_planning")
    val (table, bm) = (s"$root/t", s"$root/bm")
    (0 until 4000).map(i => (i, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
      .repartition(16, col("name")) // ids scattered: min/max prunes nothing
      .write.mode("overwrite").parquet(table)
    FileBloom.build(s, table, "id", bm, m = 8192, k = 4)
    (table, bm)
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

  test("point and IN probes scan fewer files than the table holds") {
    val (table, bm) = layout
    val (scanned, total) = scanMetrics(
      BloomFileIndex.read(spark, table, bm, "id").filter(col("id") === 1234))
    assert(total === 16)
    assert(scanned < total, s"no files skipped: scanned $scanned of $total")
    assert(scanned > 0, "the key exists; its file must survive")

    val (s2, t2) = scanMetrics(BloomFileIndex.read(spark, table, bm, "id")
      .filter(col("id").isin(3, 1777, 3999)))
    assert(s2 < t2, s"IN probe skipped nothing: $s2 of $t2")
  }

  test("the skipping scan's answer equals the plain reader's") {
    val (table, bm) = layout
    def probe(df: DataFrame): Set[String] = df
      .filter(col("id").isin(3, 1777, 3999))
      .select(concat_ws("|", col("id"), col("name"), col("grp")))
      .collect().map(_.getString(0)).toSet
    val plain = probe(spark.read.parquet(table))
    assert(plain.size === 3)
    assert(probe(BloomFileIndex.read(spark, table, bm, "id")) === plain)
  }

  test("predicates stay pushed to the parquet reader") {
    val (table, bm) = layout
    val df = BloomFileIndex.read(spark, table, bm, "id")
      .filter(col("id") === 1234)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("id"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
  }

  test("a predicate on another column scans every file") {
    val (table, bm) = layout
    val (scanned, total) = scanMetrics(
      BloomFileIndex.read(spark, table, bm, "id").filter(col("grp") === 3))
    assert(scanned === total, "non-indexed predicate must not skip anything")
  }

  test("files landed after the index was built are always scanned") {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("bloom_unknown")
    val (table, bm) = (s"$root/t", s"$root/bm")
    (0 until 1000).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
      .repartition(8, col("name")).write.mode("overwrite").parquet(table)
    FileBloom.build(s, table, "id", bm, m = 4096, k = 4)
    // a late file with ids the index never saw
    Seq((55555, "late", 0)).toDF("id", "name", "grp")
      .coalesce(1).write.mode("append").parquet(table)
    val got = BloomFileIndex.read(s, table, bm, "id")
      .filter(col("id") === 55555).select("name")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("late"), "unknown file was wrongly pruned")
  }

  test("skip counts stay visible through an AQE-wrapped aggregate") {
    val (table, bm) = layout
    val (df, idx) = BloomFileIndex.readWithIndex(spark, table, bm, "id")
    df.filter(col("id") === 1234).agg(count(lit(1))).head()
    val (surv, listed) = idx.lastListing.getOrElse(fail("listFiles never ran"))
    assert(surv > 0 && surv < listed, s"no skip recorded: $surv of $listed")
  }

  test("extractKeySets: equality, IN, widened casts, and all-or-nothing") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, In, Literal}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val a = Symbol("id").int
    val eq = BloomFileIndex.extractKeySets(Seq(EqualTo(a, Literal(5))), "id")
    assert(eq === Seq(Seq(Literal(5, IntegerType))))
    val in = BloomFileIndex.extractKeySets(
      Seq(In(a, Seq(Literal(3), Literal(9)))), "id")
    assert(in === Seq(Seq(Literal(3, IntegerType), Literal(9, IntegerType))))
    // analyzer-widened: CAST(id AS BIGINT) = 7L narrows back to int 7
    val widened = BloomFileIndex.extractKeySets(
      Seq(EqualTo(Cast(a, LongType), Literal(7L))), "id")
    assert(widened === Seq(Seq(Literal(7, IntegerType))))
    // a key that cannot narrow losslessly poisons its whole conjunct
    val lossy = BloomFileIndex.extractKeySets(
      Seq(In(Cast(a, LongType), Seq(Literal(7L), Literal(1L << 40)))), "id")
    assert(lossy.isEmpty)
    // other columns and non-equality shapes contribute nothing
    assert(BloomFileIndex.extractKeySets(Seq(a > 5), "id").isEmpty)
    assert(BloomFileIndex.extractKeySets(
      Seq(EqualTo(Symbol("other").int, Literal(5))), "id").isEmpty)
  }

  test("only (file, flen, fmtime) rows cross the driver boundary") {
    // the probe is a Spark job over the index parquet; what the
    // FileIndex collects is its output — names and two longs, never
    // the per-file bitsets (VERDICT r10 ask #1: 100k files × 32 KB
    // filters must not become 3.2 GB of driver residency)
    val (_, bm) = layout
    val pos = Seq(Seq(FileBloom.positionsOf(lit(1234), 8192, 4)))
    val job = BloomFileIndex.pruneJob(spark, bm, pos)
    assert(job.columns.toSeq === Seq("file", "flen", "fmtime"))
    assert(!job.schema.fields.exists(_.dataType.typeName.contains("array")),
      s"bitset column leaked into the driver collect: ${job.schema}")
    assert(job.count() < 16, "the probe key's own file must not be prunable")
  }

  test("the prune cache is bounded under ever-changing probe keys") {
    // a long-lived index instance serving a lookup workload sees a
    // new literal per query; the per-filter-set cache must evict, not
    // accumulate one prunable list per key ever probed
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    val (table, bm) = layout
    val (_, idx) = BloomFileIndex.readWithIndex(spark, table, bm, "id")
    val a = Symbol("id").int
    (0 until BloomFileIndex.PruneCacheMax + 8).foreach { k =>
      idx.listFiles(Nil, Seq(EqualTo(a, Literal(k))))
    }
    assert(idx.pruneCacheSize <= BloomFileIndex.PruneCacheMax,
      s"prune cache grew past its bound: ${idx.pruneCacheSize}")
  }

  test("a NARROWING cast on the column is never looked through") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
    import org.apache.spark.sql.types.IntegerType
    // user-written cast(longCol AS INT) = 5 matches column values by
    // MODULAR arithmetic under non-ANSI semantics (x = 2^32 + 5 also
    // satisfies it), so hashing int 5 against the long column's bloom
    // would wrongly prune the file holding the wrapped value — the
    // conjunct must contribute nothing (ADVICE r10)
    val long = Symbol("id").long
    assert(BloomFileIndex.extractKeySets(
      Seq(EqualTo(Cast(long, IntegerType), Literal(5))), "id").isEmpty)
    // a cast on a non-integral column is equally opaque
    val str = Symbol("id").string
    assert(BloomFileIndex.extractKeySets(
      Seq(EqualTo(Cast(str, IntegerType), Literal(5))), "id").isEmpty)
  }
}
