package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestSession

class IdempotentSinkSpec extends AnyFunSuite with SparkTestSession {

  test("foreachBatch stream commits each batch once; replay is a no-op") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("idem_sink").toString + "/stream"

    val in = MemoryStream[Long]
    val q = in.toDF().toDF("v").writeStream.foreachBatch(IdempotentSink.writer(out)).start()
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      in.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()

    assert(IdempotentSink.committedBatches(spark, out) === Seq(0L, 1L))
    val all = IdempotentSink.readCommitted(spark, out)
    assert(all.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))

    // crash-replay of the last batch: same id, same data — marker wins
    val replayed = Seq(4L, 5L).toDF("v")
    IdempotentSink.writer(out)(replayed, 1L)
    assert(IdempotentSink.readCommitted(spark, out).count() === 5L)

    // a half-written UNCOMMITTED attempt (data, no marker) is invisible
    Seq(99L).toDF("v").write.mode("overwrite").parquet(s"$out/batch=2")
    assert(IdempotentSink.committedBatches(spark, out) === Seq(0L, 1L))
    // stray marker-lookalikes (backup suffixes) are ignored, not fatal
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$out/_committed_0.bak"))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$out/_committed_tmp"))
    assert(IdempotentSink.committedBatches(spark, out) === Seq(0L, 1L))
    assert(IdempotentSink.readCommitted(spark, out).count() === 5L)
    // the re-run of that batch overwrites the partial and commits it
    IdempotentSink.writer(out)(Seq(6L).toDF("v"), 2L)
    assert(IdempotentSink.readCommitted(spark, out).count() === 6L)
  }
}
