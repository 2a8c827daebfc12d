package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession

/** The FILE streaming source + Trigger.AvailableNow — the incremental-
  * batch pattern every production lake ingest runs (st01–st10 exercise
  * MemoryStream; this is the source a real deployment points at a
  * landing directory): process everything present, then STOP; a later
  * run picks up only files that arrived since, tracked by the
  * checkpoint's file log. Composed with [[IdempotentSink]], the pair
  * is an end-to-end exactly-once file-to-file incremental pipeline.
  */
class FileStreamSpec extends AnyFunSuite with SparkTestSession {

  test("AvailableNow file stream: drains the directory, stops, resumes incrementally") {
    val s = spark; import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("filestream").toString
    val in = base + "/landing"; val out = base + "/out"; val ckpt = base + "/ckpt"

    (1L to 40L).toDF("v").coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("v BIGINT")
        .parquet(in)
        .withColumn("doubled", col("v") * 2)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(IdempotentSink.writer(out))
        .start()
      q.awaitTermination(120000L) // AvailableNow self-terminates
      assert(!q.isActive, "AvailableNow query should stop when drained")
    }

    runOnce()
    val first = IdempotentSink.readCommitted(spark, out)
    assert(first.count() === 40L)
    assert(first.agg(sum("doubled")).head.getLong(0) === 2L * (40L * 41L / 2L))

    // new files land; a SECOND run processes only the delta
    (41L to 50L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val all = IdempotentSink.readCommitted(spark, out)
    assert(all.count() === 50L, "second run must pick up only the new files, no re-reads")
    assert(all.select("v").distinct().count() === 50L)
  }
}
