package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The claim that makes unbounded-input streaming viable at 100 TB:
  * watermarked window state is bounded by the EVENT-TIME HORIZON, not
  * by total input. A file-source windowed aggregation consumes six
  * event-time-ordered batches (the sf0.001 events table re-shifted
  * per copy); because the watermark advances batch by batch, closed
  * windows are evicted as new ones open, so the state store must
  * PLATEAU near one batch's window count while emitted output grows
  * with every batch. Asserted on the engine's own state-operator
  * metrics (numRowsTotal per progress), plus append-mode correctness:
  * once a far-future sentinel closes every real window, the emitted
  * set equals the batch groupBy over all copies.
  */
class StateBoundSpec extends AnyFunSuite with SparkTestSession {

  test("watermarked window state plateaus at the horizon bound while output grows") {
    val s = spark
    val copies = 6
    val base = java.nio.file.Files.createTempDirectory("state_bound").toString
    val dir = s"$base/in"

    // Tables.events canonicalizes ts to Long NANOSECONDS at the scan
    // boundary; all shifting happens in that integer domain and the
    // engine-facing timestamp is derived via timestamp_micros
    val ev = graft.queries.Tables.events(s, "/root/testdata/sf0.001")
      .select("ts", "event_type", "value")
    val Seq(tmin, tmax) = ev.agg(min("ts"), max("ts"))
      .head().toSeq.map(_.asInstanceOf[Long])
    val span = tmax - tmin + 3600L * 1000000000L

    // one file per copy, ascending modification time = ascending event time
    (0 until copies).foreach { c =>
      ev.withColumn("ts", col("ts") + lit(c * span))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    // sentinel far past every copy: advances the watermark so every
    // real window closes and appends; its own window never does
    ev.limit(1).withColumn("ts", col("ts") + lit(copies.toLong * 2 * span))
      .coalesce(1).write.mode("append").parquet(dir)

    def withEventTime(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("event_time", expr("timestamp_micros(ts DIV 1000)"))

    val expected = withEventTime(
      s.read.parquet(dir).filter(col("ts") < tmin + copies * span))
      .groupBy(window(col("event_time"), "60 seconds"), col("event_type"))
      .count().count()

    val sq = withEventTime(
      s.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(dir))
      .withWatermark("event_time", "300 seconds")
      .groupBy(window(col("event_time"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("state_bound")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val stateRows =
      try {
        sq.processAllAvailable()
        sq.recentProgress.toSeq.flatMap(_.stateOperators.headOption)
          .map(_.numRowsTotal)
      } finally sq.stop()

    assert(s.table("state_bound").count() === expected)

    // state never holds more than ~one batch's windows (+ horizon
    // slack), even though six batches' worth of windows were emitted:
    // growth in OUTPUT, plateau in STATE
    val perBatchBound = expected / copies + 64
    assert(stateRows.nonEmpty && stateRows.max <= 2 * perBatchBound,
      s"state rows ${stateRows.mkString(",")} exceed plateau bound ${2 * perBatchBound}")
    assert(stateRows.max < expected / 2,
      s"state ${stateRows.max} should stay well under total windows $expected")
  }

  test("full-outer join buffers drain once both horizons close") {
    // st27's shape: both sides buffer until the watermark passes the
    // match horizon (left) / the row's own time (right). After the
    // sentinel rounds close every horizon, state must DRAIN to the
    // sentinels themselves — watermark eviction, not accumulation, is
    // what lets the join run forever.
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val ev = graft.queries.Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), graft.queries.Tables.tsSec.as("sec"))
      .as[(Long, Long, Long)].collect().toSeq
    val (evens, odds) = ev.partition(_._1 % 2 == 0)
    val far = ev.map(_._3).max + 100L * 3600L

    val inL = MemoryStream[(Long, Long, Long)]
    val inR = MemoryStream[(Long, Long, Long)]
    val l = inL.toDF().toDF("l_event", "l_user", "l_sec")
      .withColumn("l_ts", timestamp_seconds(col("l_sec")))
      .withWatermark("l_ts", "10 seconds")
    val r = inR.toDF().toDF("r_event", "r_user", "r_sec")
      .withColumn("r_ts", timestamp_seconds(col("r_sec")))
      .withWatermark("r_ts", "10 seconds")
    val q = l.join(r,
        col("l_user") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR"),
        "full_outer")
      .writeStream.format("memory").queryName("fo_drain")
      .outputMode("append").start()
    val states =
      try {
        inL.addData(evens); inR.addData(odds)
        q.processAllAvailable()
        inL.addData((-2L, -1L, far)); inR.addData((-3L, -1L, far))
        q.processAllAvailable()
        inL.addData((-2L, -1L, far)); inR.addData((-3L, -1L, far))
        q.processAllAvailable()
        q.recentProgress.toSeq.flatMap(_.stateOperators.headOption)
          .map(_.numRowsTotal)
      } finally q.stop()

    assert(states.nonEmpty)
    val (peak, last) = (states.max, states.last)
    assert(peak >= ev.size,
      s"peak state $peak should have buffered both sides (${ev.size} rows)")
    assert(last <= 8,
      s"state must drain to the sentinel rows after the horizons close, got $last " +
        s"(history: ${states.mkString(",")})")
  }
}
