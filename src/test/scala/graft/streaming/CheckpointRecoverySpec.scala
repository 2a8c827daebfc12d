package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestSession

/** Fault-tolerance semantics end to end: a stateful streaming query
  * (dropDuplicates) writing through [[IdempotentSink]] is STOPPED and
  * a NEW query instance restarts from the same checkpoint — committed
  * offsets are not reprocessed, the dedup state survives the restart
  * (cross-restart duplicates are still dropped), and the committed
  * output is exactly the distinct set. This is the crash-recovery
  * contract a production deployment relies on, asserted on the real
  * checkpoint + state-store machinery, not mocks.
  */
class CheckpointRecoverySpec extends AnyFunSuite with SparkTestSession {

  test("stateful query restarts from checkpoint: state restored, no dup, no loss") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ckpt_rec").toString
    val out = base + "/out"; val ckpt = base + "/ckpt"

    val in = MemoryStream[Long]
    def start() = in.toDF().toDF("k")
      .dropDuplicates("k")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(IdempotentSink.writer(out))
      .start()

    // phase 1: two keys + an in-batch duplicate, then STOP (a "crash")
    val q1 = start()
    try {
      in.addData(1L, 2L, 1L)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(IdempotentSink.readCommitted(spark, out).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))

    // phase 2: NEW query instance, same checkpoint. The dedup state
    // must survive: 1 and 2 are dropped across the restart; 3 lands.
    val q2 = start()
    try {
      in.addData(2L, 3L, 1L)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = IdempotentSink.readCommitted(spark, out).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
    // batch ids continued past the restart instead of starting over
    assert(IdempotentSink.committedBatches(spark, out).size >= 2)
  }
}
