package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkTestSession
import graft.functions.{KmvMergeAggregator, KmvSketch, KmvSketchAggregator}

/** [[SketchIndex]]: the persisted per-month theta index must (a) prune
  * to exactly the probed month directories at PLANNING time (VERDICT
  * r8 ask #5 — the read-path proof, same assertion style as
  * GenericSourceSpec's hive-partition test), and (b) merge-on-read to
  * the one-shot sketch regardless of how many appended partials a
  * month accumulated (the st23 streaming-maintenance contract).
  */
class SketchIndexSpec extends AnyFunSuite with SparkTestSession {

  private val K = 64
  private val Month = 2592000L // 30-day months, keys spread over 10 of them

  private def rows(n: Int, seed: Long) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      ((i % 10).toLong * Month, seed * 1000000L + (i % 350).toLong)
    }.toDF("month_sec", "key")
  }

  test("probeRange scans only the in-range month partitions (planning-time pruning)") {
    val dir = graft.core.Scratch.dir("ski_prune")
    SketchIndex.writeMonthly(rows(5000, 1), "month_sec", "key", dir, K)
    val probe = SketchIndex.probeRange(spark, dir, 3L * Month, 7L * Month)
    assert(probe.select("month_sec").collect().map(_.getLong(0)).sorted.toSeq ==
      (3L to 6L).map(_ * Month))
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, "expected planning-time partition filters")
    assert(scan.selectedPartitions.partitionCount === 4,
      "expected exactly the 4 in-range month directories")
  }

  test("appended partials merge-on-read to the one-shot batch sketch") {
    val s = spark
    import s.implicits._
    val all = rows(5000, 2)
    val dir = graft.core.Scratch.dir("ski_merge")
    // three uneven "micro-batches" split on a row hash, like st23
    Seq(0, 1, 2).foreach { b =>
      SketchIndex.appendMonthly(
        all.filter(pmod(col("key") * 31 + col("month_sec"), lit(3)) === b),
        "month_sec", "key", dir, K)
    }
    val kmvMerge = udaf(new KmvMergeAggregator(K))
    val merged = SketchIndex.read(s, dir)
      .groupBy("month_sec").agg(kmvMerge(col("sk")).as("sk"))
    val kmv = udaf(new KmvSketchAggregator(K))
    val oneShot = all
      .select(col("month_sec"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("month_sec").agg(kmv(col("h")).as("sk"))
    val a = merged.orderBy("month_sec").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val b = oneShot.orderBy("month_sec").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq == b.toSeq)
    // a month accumulated multiple partial rows, so merge-on-read did fold
    assert(SketchIndex.read(s, dir).count() > 10)
  }

  test("read normalizes the inferred partition type back to long") {
    val dir = graft.core.Scratch.dir("ski_type")
    SketchIndex.writeMonthly(rows(500, 3), "month_sec", "key", dir, K)
    assert(SketchIndex.read(spark, dir).schema("month_sec").dataType ==
      org.apache.spark.sql.types.LongType)
  }
}
