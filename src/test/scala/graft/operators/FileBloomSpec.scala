package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The per-file Bloom index (operators/FileBloom):
  *
  *   1. build/probe hash consistency is pinned — the driver-side
  *      positionsOf equals what the builtin expression computes in a
  *      running plan, for both integral and string keys;
  *   2. no false negatives: every file actually holding a probed key
  *      survives pruning, and the pruned read's answer equals the
  *      full scan's;
  *   3. pruning actually happens on an unclustered layout where the
  *      zone map would keep everything (min/max spans the domain);
  *   4. maintenance is replay-safe: an at-least-once double-append
  *      changes no probe, and compactStats folds the partials to one
  *      file without changing rows.
  */
class FileBloomSpec extends AnyFunSuite with SparkTestSession {

  private def writeTable(dir: String, n: Int, files: Int): Unit = {
    val s = spark; import s.implicits._
    (0 until n).map(i => (i, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
      .repartition(files, col("name")) // scatter ids: worst case for min/max
      .write.mode("overwrite").parquet(dir)
  }

  test("driver-side positionsOf matches the builtin expression per row") {
    val s = spark; import s.implicits._
    val (m, k) = (512, 4)
    // the same transform expression the build side runs, evaluated in
    // a plan over one row, vs the folded driver-side evaluation
    def planside(c: org.apache.spark.sql.Column): Seq[Int] = {
      val salt = lit(0x9E3779B97F4A7C15L)
      val (a, b) = (pmod(xxhash64(c), lit(m.toLong)),
        pmod(xxhash64(c, salt), lit(m.toLong)))
      Seq(0).toDF("z").select(transform(sequence(lit(0), lit(k - 1)),
          j => pmod(a + j.cast("long") * b, lit(m.toLong)).cast("int")).as("p"))
        .collect()(0).getSeq[Int](0)
    }
    assert(FileBloom.positionsOf(lit(42), m, k) === planside(lit(42)))
    assert(FileBloom.positionsOf(lit(42L), m, k) === planside(lit(42L)))
    assert(FileBloom.positionsOf(lit("doc_17"), m, k) === planside(lit("doc_17")))
    // int and long keys hash differently — the type discipline the
    // scaladoc demands is real, not pedantry
    assert(FileBloom.positionsOf(lit(42), m, k) !==
      FileBloom.positionsOf(lit(42L), m, k))
  }

  test("no false negatives + answer equality + files actually skipped") {
    val s = spark
    val dir = graft.core.Scratch.dir("bloom_idx")
    val (table, bloom) = (s"$dir/t", s"$dir/bm")
    writeTable(table, n = 2000, files = 16)
    FileBloom.build(s, table, "id", bloom, m = 8192, k = 4)
    assert(FileBloom.fileCount(s, bloom) === 16)

    val keys = Seq(3, 977, 1555).map(lit(_))
    // ground truth: the files that REALLY hold each key
    val holding = s.read.parquet(table)
      .filter(col("id").isin(3, 977, 1555))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val pruned = FileBloom.prunedFiles(s, bloom, keys).toSet
    assert(holding.subsetOf(pruned), "bloom pruning lost a real file")
    assert(pruned.size < 16,
      s"no pruning happened (${pruned.size} of 16 survived)")

    val got = FileBloom.readPruned(s, table, bloom, "id", keys)
      .select("id", "name", "grp").collect().map(_.toSeq).toSet
    val want = s.read.parquet(table).filter(col("id").isin(3, 977, 1555))
      .select("id", "name", "grp").collect().map(_.toSeq).toSet
    assert(got === want)

    // a key nothing contains: candidate set may be empty or tiny
    // (false positives allowed), the answer must be empty regardless
    assert(FileBloom.readPruned(s, table, bloom, "id",
      Seq(lit(999999))).count() === 0)

    // a key literal of the wrong type would hash differently and
    // silently prune every file — readPruned must refuse it loudly
    val err = intercept[IllegalArgumentException] {
      FileBloom.readPruned(s, table, bloom, "id", Seq(lit(3L)))
    }
    assert(err.getMessage.contains("cast the key literal"))
  }

  test("append-maintained index replays safely and compacts to one file") {
    val s = spark
    val dir = graft.core.Scratch.dir("bloom_maint")
    val (table, bloom) = (s"$dir/t", s"$dir/bm")
    writeTable(table, n = 1000, files = 8)
    val files = ZoneMap.dataFiles(s, table)
    assert(files.size === 8)
    // micro-batch appends, with one batch replayed (at-least-once)
    FileBloom.appendStats(s, files.take(3), "id", bloom, m = 4096, k = 3)
    FileBloom.appendStats(s, files.drop(3), "id", bloom, m = 4096, k = 3)
    FileBloom.appendStats(s, files.take(3), "id", bloom, m = 4096, k = 3) // replay

    val keys = Seq(lit(11), lit(870))
    val before = FileBloom.readPruned(s, table, bloom, "id", keys)
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(before === Seq(11, 870))
    // replayed rows are identical; path-dedup keeps reads exactly-once
    assert(FileBloom.prunedFiles(s, bloom, keys).distinct.size ===
      FileBloom.prunedFiles(s, bloom, keys).size)

    FileBloom.compactStats(s, bloom)
    assert(ZoneMap.dataFiles(s, bloom).size === 1,
      "compactStats must fold partials to one stats file")
    assert(FileBloom.fileCount(s, bloom) === 8)
    val after = FileBloom.readPruned(s, table, bloom, "id", keys)
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(after === before)
  }
}
