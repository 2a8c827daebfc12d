package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.{FileBloom, IndexStat, ZoneMap}
import graft.operators.ZoneMap.Range

/** A base file REWRITTEN IN PLACE under the same name (an external
  * compaction, a backfill) keeps its path but not its (length, mtime)
  * fingerprint. Every persisted-stats probe path — ZoneMap.readPruned,
  * FileBloom.readPruned, and both planning-time FileIndexes — must
  * demote such a file to "unknown → always scan" instead of trusting
  * the stale row and silently missing the rows that now exist
  * (VERDICT r10 ask #2). The lifecycle verbs (appendStats,
  * compactStats) must carry the fingerprint columns through, and
  * staleFiles must name exactly the rewritten file.
  */
class StalenessSpec extends AnyFunSuite with SparkTestSession {

  /** Replace the single parquet file at `target` with `df`'s rows —
    * same path, different content, the shape of an external rewrite.
    * The replacement has a different row count, so length (not just
    * mtime) distinguishes the versions.
    */
  private def rewriteInPlace(target: String, df: DataFrame): Unit = {
    val tmp = graft.core.Scratch.dir("rewrite_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    val dst = new Path(target)
    fs.delete(dst, false)
    assert(FileUtil.copy(fs, part, fs, dst, false, conf))
  }

  /** A table whose files each hold one disjoint band of x, its zone
    * map and bloom index, and the path of the file holding band 0 —
    * the one the tests rewrite.
    */
  private def fixture(): (String, String, String, String) = {
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("staleness")
    val table = s"$root/t"
    // four single-file landings so file↔band is deterministic
    (0 until 4).foreach { band =>
      (band * 100 until band * 100 + 100)
        .map(x => (x.toLong, s"name_$x")).toDF("x", "name")
        .coalesce(1).write.mode("append").parquet(table)
    }
    val (zm, bm) = (s"$root/zm", s"$root/bm")
    ZoneMap.build(s, table, Seq("x"), zm)
    FileBloom.build(s, table, "x", bm, m = 4096, k = 4)
    // the file holding band 0 (x in [0, 99])
    val band0 = s.read.parquet(table).filter(col("x") < 100)
      .select(input_file_name()).distinct().head().getString(0)
    (table, zm, bm, new Path(band0).toUri.getPath)
  }

  test("all four probe paths scan a file rewritten in place") {
    val s = spark; import s.implicits._
    val (table, zm, bm, band0) = fixture()
    // before the rewrite: nothing holds x >= 10000, indexes prove it
    assert(ZoneMap.readPruned(s, table, zm,
      Seq(Range("x", 10000, 10099))).count() === 0)
    assert(FileBloom.readPruned(s, table, bm, "x",
      Seq(lit(10057L))).count() === 0)

    // the external rewrite: band 0's file now holds x in [10000, 10056]
    rewriteInPlace(band0,
      (10000 until 10057).map(x => (x.toLong, s"name_$x")).toDF("x", "name"))

    // driver probe paths: the stale rows say "can't match" — the live
    // fingerprint mismatch must force the scan anyway
    assert(ZoneMap.readPruned(s, table, zm,
      Seq(Range("x", 10000, 10099))).count() === 57,
      "zone-map probe trusted a stale row and missed rewritten rows")
    assert(FileBloom.readPruned(s, table, bm, "x",
      Seq(lit(10057L))).count() === 0) // absent key still absent
    assert(FileBloom.readPruned(s, table, bm, "x",
      Seq(lit(10042L))).select("name").head().getString(0) === "name_10042",
      "bloom probe trusted a stale row and missed rewritten rows")

    // planning-time paths: indexes constructed AFTER the rewrite see
    // the live listing; the stale stats row matches no fingerprint
    val zmGot = ZoneMapFileIndex.read(s, table, zm, Set("x"))
      .filter(col("x").between(10000, 10099)).count()
    assert(zmGot === 57, "ZoneMapFileIndex pruned a rewritten file")
    val bmGot = BloomFileIndex.read(s, table, bm, "x")
      .filter(col("x") === 10042L).count()
    assert(bmGot === 1, "BloomFileIndex pruned a rewritten file")

    // fresh files still prune: a probe inside band 2 must skip files
    val (df, idx) = ZoneMapFileIndex.readWithIndex(s, table, zm, Set("x"))
    df.filter(col("x").between(200, 220)).collect()
    val (surv, listed) = idx.lastListing.get
    assert(listed === 4 && surv < listed,
      s"staleness guard destroyed pruning: $surv of $listed")

    // the maintenance signal names exactly the rewritten file
    assert(ZoneMap.staleFiles(s, table, zm) === Seq(band0))
    assert(FileBloom.staleFiles(s, table, bm) === Seq(band0))
  }

  test("re-appending stats for the rewritten file restores pruning") {
    val s = spark; import s.implicits._
    val (table, zm, bm, band0) = fixture()
    rewriteInPlace(band0,
      (10000 until 10057).map(x => (x.toLong, s"name_$x")).toDF("x", "name"))
    // the maintenance pass a deployment runs on the staleFiles signal
    ZoneMap.appendStats(s, Seq(band0), Seq("x"), zm)
    FileBloom.appendStats(s, Seq(band0), "x", bm, m = 4096, k = 4)
    assert(ZoneMap.staleFiles(s, table, zm).isEmpty)
    assert(FileBloom.staleFiles(s, table, bm).isEmpty)

    // the fresh row proves absence again — band-0 probes that used to
    // hit the file now skip it, without losing the rewritten rows
    val (df, idx) = ZoneMapFileIndex.readWithIndex(s, table, zm, Set("x"))
    assert(df.filter(col("x").between(0, 99)).count() === 0)
    val (surv, listed) = idx.lastListing.get
    assert(surv < listed, s"fresh re-append did not restore pruning: $surv of $listed")
    assert(ZoneMap.readPruned(s, table, zm,
      Seq(Range("x", 10000, 10099))).count() === 57)

    // compaction folds stale + fresh rows and keeps the fingerprints
    ZoneMap.compactStats(s, zm)
    FileBloom.compactStats(s, bm)
    assert(s.read.parquet(zm).columns.toSet.intersect(Set("flen", "fmtime"))
      === Set("flen", "fmtime"))
    assert(s.read.parquet(bm).columns.toSet.intersect(Set("flen", "fmtime"))
      === Set("flen", "fmtime"))
    assert(ZoneMap.readPruned(s, table, zm,
      Seq(Range("x", 10000, 10099))).count() === 57)
    assert(FileBloom.readPruned(s, table, bm, "x",
      Seq(lit(10042L))).count() === 1)

    // …and the compact must keep the FRESH row: a path-only dedupe
    // could nondeterministically keep the STALE one — answers stay
    // right (stale rows demote to scan) but pruning for the
    // just-repaired file is lost and staleFiles re-reports it forever
    // (ADVICE r11). Deterministic now: coexisting fingerprints both
    // survive, the live-matching one keeps proving absence.
    assert(ZoneMap.staleFiles(s, table, zm).isEmpty,
      "compaction dropped the fresh zone-map row")
    assert(FileBloom.staleFiles(s, table, bm).isEmpty,
      "compaction dropped the fresh bloom row")
    val (df2, idx2) = ZoneMapFileIndex.readWithIndex(s, table, zm, Set("x"))
    assert(df2.filter(col("x").between(0, 99)).count() === 0)
    val (surv2, listed2) = idx2.lastListing.get
    assert(surv2 < listed2,
      s"compaction lost pruning for the repaired file: $surv2 of $listed2")
  }

  test("a file landed after the index was built is always read") {
    val s = spark; import s.implicits._
    val (table, zm, bm, _) = fixture()
    Seq((77777L, "late")).toDF("x", "name")
      .coalesce(1).write.mode("append").parquet(table)
    // unknown to both indexes: the driver paths must include it
    assert(ZoneMap.readPruned(s, table, zm, Seq(Range("x", 77000, 78000)))
      .select("name").head().getString(0) === "late")
    assert(FileBloom.readPruned(s, table, bm, "x", Seq(lit(77777L)))
      .select("name").head().getString(0) === "late")
    // and it is not "stale" — it was never recorded
    assert(ZoneMap.staleFiles(s, table, zm).isEmpty)
    assert(FileBloom.staleFiles(s, table, bm).isEmpty)
  }

  test("a hive-partitioned layout's nested files are live, not 'deleted'") {
    // stats rows come from input_file_name(), which sees nested
    // part-files; the live listing must be RECURSIVE or every
    // recorded file of a partitioned table reads as deleted — a wrong
    // maintenance signal (answers were never at risk: unknown files
    // always scan)
    val s = spark; import s.implicits._
    val root = graft.core.Scratch.dir("staleness_part")
    val table = s"$root/t"
    (0 until 400).map(x => (x.toLong, x % 4)).toDF("x", "part")
      .write.partitionBy("part").mode("overwrite").parquet(table)
    ZoneMap.build(s, table, Seq("x"), s"$root/zm")
    assert(ZoneMap.staleFiles(s, table, s"$root/zm").isEmpty,
      "recursive listing must see nested part-files as live")
    assert(ZoneMap.readPruned(s, table, s"$root/zm",
      Seq(Range("x", 10, 20))).count() === 11)
    // commit markers and hidden dirs stay excluded
    assert(IndexStat.liveStatus(s, table)
      .forall { case (p, _, _) => !p.contains("/_") && !p.contains("/.") })

    // partition COLUMNS survive the pruned read: leaf files carry no
    // `part` column — it lives in the directory names — so a direct
    // leaf read would silently drop it while the empty short-circuit
    // (full-table schema) keeps it: two branches, two schemas
    // (ADVICE r11). basePath anchors the read at the table root.
    val pruned = ZoneMap.readPruned(s, table, s"$root/zm",
      Seq(Range("x", 10, 20)))
    assert(pruned.columns.contains("part"),
      "pruned read dropped the hive partition column")
    assert(pruned.filter(col("x") === 13).select("part").head().getInt(0) === 1)
    assert(pruned.schema === ZoneMap.readPruned(s, table, s"$root/zm",
      Seq(Range("x", 900000, 900001))).schema,
      "non-empty and empty readPruned branches disagree on schema")
    FileBloom.build(s, table, "x", s"$root/bm", m = 4096, k = 4)
    val bp = FileBloom.readPruned(s, table, s"$root/bm", "x", Seq(lit(13L)))
    assert(bp.columns.contains("part") &&
      bp.select("part").head().getInt(0) === 1,
      "bloom pruned read dropped the hive partition column")
  }

  test("staleOf reports deleted recorded files and exact matches nothing else") {
    val rec = Seq(("file:/a", 10L, 1L), ("file:/a", 20L, 2L), ("file:/b", 5L, 9L))
    val live = Seq(("file:/a", 20L, 2L)) // a matches its second version; b gone
    assert(IndexStat.staleOf(rec, live) === Seq("/b"))
    assert(IndexStat.staleOf(rec,
      Seq(("file:/a", 20L, 2L), ("file:/b", 5L, 9L))) === Seq.empty)
    // a rewritten under the same name: no version matches
    assert(IndexStat.staleOf(rec,
      Seq(("file:/a", 99L, 9L), ("file:/b", 5L, 9L))) === Seq("/a"))
  }
}
