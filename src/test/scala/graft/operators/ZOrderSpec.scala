package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Z-order layout: key arithmetic against a reference interleave, and
  * the actual payoff — a 2-dimensional box predicate over the
  * z-ordered layout touches a fraction of the files the same data in
  * arrival order needs. File-level clustering is what min/max skipping
  * consumes at scale; distinct-files-touched is its direct, plan-free
  * measurement.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestSession {

  private def refInterleave(xs: Seq[Long], bits: Int): Long = {
    var out = 0L
    val n = xs.size
    for (i <- xs.indices; j <- 0 until bits)
      out |= ((xs(i) >> j) & 1L) << (j * n + i)
    out
  }

  test("zkey matches a reference bit-interleave, including the clamp") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 1L),
      (5000L, -7L)) // out of range on both sides -> clamped to 1023 / 0
    val s = spark; import s.implicits._
    val got = rows.toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), bits = 10).as("z"))
      .as[Long].collect()
    val want = rows.map { case (x, y) =>
      refInterleave(Seq(x.max(0L).min(1023L), y.max(0L).min(1023L)), 10)
    }
    assert(got.toSeq === want)
  }

  test("zkeySql emits the same interleave the Column form computes") {
    // adjacent cells differ in the lowest interleaved bits only
    assert(refInterleave(Seq(1L, 0L), 10) === 1L)
    assert(refInterleave(Seq(0L, 1L), 10) === 2L)
    // exact rendering for bits=2 (value parity with the Column form is
    // q32's cross-engine hash gate; this pins the bit positions)
    assert(ZOrder.zkeySql(Seq("x", "y"), bits = 2) ===
      "((((x >> 0) & 1) << 0) | (((x >> 1) & 1) << 2) | " +
        "(((y >> 0) & 1) << 1) | (((y >> 1) & 1) << 3))")
  }

  test("a 2-dim box over the z-ordered layout touches fewer files") {
    val base = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("value_c", floor(col("value") * 100).cast("long") % 1024)
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val files = 16

    // arrival-order layout: same file count, no dimensional clustering
    base.orderBy("event_id").repartitionByRange(files, col("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/natural")
    ZOrder.writeZOrdered(base, s"$tmp/zorder",
      dims = Seq("user_id", "value_c"), bits = 10, files = files)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("user_id").between(40, 60) && col("value_c").between(200, 400))
        .select(col("_metadata.file_path"))
        .distinct().count()

    val natural = filesTouched(s"$tmp/natural")
    val z = filesTouched(s"$tmp/zorder")
    // the box selects ~3% of the key space: arrival order scatters it
    // across essentially every file, z-order confines it
    assert(natural >= files - 2, s"natural layout should scatter: $natural/$files")
    assert(z <= natural / 2, s"z-order should at least halve files touched: $z vs $natural")
    // identical content either way
    assert(spark.read.parquet(s"$tmp/zorder").count() === base.count())
  }
}
