package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.SparkTestSession

class GenericSourceSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")

  private def sample = {
    val s = spark; import s.implicits._
    Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.0)).toDF("id", "name", "score")
  }

  for (fmt <- Seq(GenericSource.Parquet, GenericSource.Orc,
                  GenericSource.Csv, GenericSource.Json, GenericSource.Xml)) {
    test(s"${fmt.name}: write then schema-pinned read round-trips") {
      val dir = Files.createTempDirectory(s"src_${fmt.name}").toString + "/data"
      GenericSource.write(sample, fmt, dir, targetPartitions = Some(1))
      val back = GenericSource.read(spark, fmt, dir, schema)
      assert(back.schema === schema)
      assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
        === Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.0)))
    }
  }

  test("text: single-column line round-trip") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("src_text").toString + "/data"
    val docs = Seq("alpha beta", "gamma", "").toDF("value")
    GenericSource.write(docs, GenericSource.Text, dir, targetPartitions = Some(1))
    val back = GenericSource.read(spark, GenericSource.Text, dir,
      StructType.fromDDL("value STRING"))
    assert(back.collect().map(_.getString(0)).sorted.toSeq === Seq("", "alpha beta", "gamma"))
  }

  test("binaryFile: every file is one opaque-payload row; glob filters by extension") {
    val dir = Files.createTempDirectory("src_bin")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.img"), "media-bytes".getBytes("UTF-8"))
    Files.write(dir.resolve("skip.txt"), Array[Byte](9))
    val back = GenericSource.readBinary(spark, dir.toString,
      pathGlobFilter = Some("*.img"))
    assert(back.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val rows = back.orderBy("length").collect()
    assert(rows.length === 2, "the glob must exclude skip.txt")
    assert(rows(0).getAs[Array[Byte]]("content").toSeq === Seq[Byte](1, 2, 3))
    assert(new String(rows(1).getAs[Array[Byte]]("content"), "UTF-8") === "media-bytes")
    assert(rows.map(_.getLong(rows(0).fieldIndex("length"))).toSeq === Seq(3L, 11L))

    // maxLength skips oversized files via a pushed-down length filter
    // — per-read, no shared-conf mutation, no cross-read leak
    val capped = GenericSource.readBinary(spark, dir.toString,
      pathGlobFilter = Some("*.img"), maxLength = Some(5L))
    assert(capped.collect().map(_.getLong(capped.columns.indexOf("length"))).toSeq === Seq(3L))
    val uncapped = GenericSource.readBinary(spark, dir.toString,
      pathGlobFilter = Some("*.img"))
    assert(uncapped.count() === 2L, "a previous call's cap must not leak")
  }

  test("hive-partitioned write prunes directories on a partition filter") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("src_hive").toString + "/data"
    val rows = Seq((1L, "en", 5.0), (2L, "en", 6.0), (3L, "de", 7.0), (4L, "fr", 8.0))
      .toDF("id", "lang", "score")
    GenericSource.write(rows, GenericSource.Parquet, dir,
      partitionBy = Seq("lang"), targetPartitions = Some(1))
    // layout is lang=en/, lang=de/, lang=fr/
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("lang=")) === 3)

    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // pruning happens at planning: the scan's PartitionFilters carry the
    // predicate, and only the lang=en directory's files are read
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, "expected a planning-time partition filter")
    assert(scan.selectedPartitions.partitionCount === 1, "expected exactly the lang=en directory")
  }

  test("targetPartitions caps the output file count") {
    val dir = Files.createTempDirectory("src_parts").toString + "/data"
    GenericSource.write(sample.repartition(3), GenericSource.Parquet, dir,
      targetPartitions = Some(1))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1)
  }

  test("readMerged: columns added over time read as the union schema, null-filled") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("src_evolve").toString + "/data"
    // epoch 1: (id, name); epoch 2 adds score
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir + "/e=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(dir + "/e=2")
    val back = GenericSource.readMerged(spark, GenericSource.Parquet, dir)
    assert(back.columns.toSet === Set("id", "name", "score", "e"))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(r.fieldIndex("score"))) None else Some(r.getDouble(r.fieldIndex("score")))))
    assert(rows.toSeq === Seq((1L, "a", None), (2L, "b", Some(9.5))))
    intercept[IllegalArgumentException] {
      GenericSource.readMerged(spark, GenericSource.Csv, dir)
    }
  }

  test("compact: shattered ingest directory rewrites to sized files, rows intact") {
    val s = spark; import s.implicits._
    val base = Files.createTempDirectory("src_compact").toString
    val in = base + "/in"; val out = base + "/out"
    (1L to 1000L).toDF("id").repartition(32).write.parquet(in)
    val shattered = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(shattered === 32)
    // a generous target => everything packs into one file
    val n = GenericSource.compact(spark, GenericSource.Parquet, in, out)
    assert(n === 1L)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1)
    val back = spark.read.parquet(out)
    assert(back.count() === 1000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) === 500500L)
    intercept[IllegalArgumentException] {
      GenericSource.compact(spark, GenericSource.Parquet, in, in)
    }
    // a tiny target can't make coalesce SPLIT: the count is capped at
    // the scan's partition count and the return value reports reality
    val out2 = base + "/out2"
    val n2 = GenericSource.compact(spark, GenericSource.Parquet, out, out2,
      targetFileBytes = 1L)
    val files2 = new java.io.File(out2).listFiles().count(_.getName.endsWith(".parquet"))
    assert(n2.toInt === files2)
  }
}
