package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.reference.SpikeParams

/** One finalized-window spike alert from the streaming detector. */
final case class SpikeAlert(
    window_start: Long, num_protocol: Int, type_proto: Int,
    baseline: Int, dst_ip: Long)

/** Per-key detector state: open windows (start → (sum, count)) and
  * the last closed window's truncated average.
  */
final case class DetectState(
    windows: Map[Long, (Long, Long)], prevAvg: Option[Int])

/** Streaming-NATIVE spike detection — not a batch pipeline in
  * foreachBatch clothing: per-key tumbling windows live as executor
  * state in `flatMapGroupsWithState`, closed by the event-time
  * watermark, each closed window compared against the key's previous
  * window under the reference's spike semantics (truncating avg,
  * baseline clamp with `prev > limit`, new-key `na.fill(limit)`,
  * alert carries the baseline — hha.py:184–210, per-IP branch).
  *
  * Why manual windows: Spark disallows flatMapGroupsWithState
  * DOWNSTREAM of a streaming aggregation, so the
  * consecutive-window comparison cannot be layered on
  * [[StreamingSpike.windowedAggregate]] — the state machine owns the
  * windowing instead. State per key is O(open windows) ≤
  * watermarkDelay/windowSec + 1, bounded and checkpointed.
  *
  * One semantic delta vs the batch loop, documented: a key silent for
  * a whole window keeps its previous baseline (the batch reference
  * would treat it as new on reappearance). Gap semantics are a
  * deployment choice; this one avoids false "new-key" alerts for
  * intermittent keys.
  */
object StreamingDetect {

  implicit private val alertEnc: Encoder[SpikeAlert] = Encoders.product[SpikeAlert]
  implicit private val stateEnc: Encoder[DetectState] = Encoders.product[DetectState]
  implicit private val histEnc: Encoder[HistRow] = Encoders.product[HistRow]
  implicit private val keyEnc: Encoder[(Int, Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong)

  def detect(hist: DataFrame, windowSec: Long, watermarkDelaySec: Long,
             params: SpikeParams = SpikeParams()): Dataset[SpikeAlert] = {
    val withTime = hist
      .withColumn("event_time", col("timestamp").cast("timestamp"))
      .withWatermark("event_time", s"$watermarkDelaySec seconds")
      .as[HistRow]

    withTime
      .groupByKey(r => (r.num_protocol, r.type_proto, r.dst_ip))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Int, Long), rows: Iterator[HistRow], state: GroupState[DetectState]) =>
          val s0 = state.getOption.getOrElse(DetectState(Map.empty, None))
          val wmSec = state.getCurrentWatermarkMs() / 1000

          // ingest this batch into its tumbling windows
          var wins = s0.windows
          rows.foreach { r =>
            val ws = Math.floorDiv(r.timestamp, windowSec) * windowSec
            val (sum, cnt) = wins.getOrElse(ws, (0L, 0L))
            wins += ws -> (sum + r.CountPkt, cnt + 1)
          }

          // close every window the watermark has passed, oldest first
          val (closed, open) = wins.partition { case (ws, _) => ws + windowSec <= wmSec }
          var prev = s0.prevAvg
          val alerts = closed.toSeq.sortBy(_._1).flatMap { case (ws, (sum, cnt)) =>
            val avg = (sum.toDouble / cnt).toInt // truncating cast (hha.py:143)
            val baseline = prev match {
              case Some(p) =>
                // hha.py:191 clamp: ratio AND prev > limit
                if (p.toDouble / avg > params.quotientAmplification && p > params.limitNewData)
                  params.limitNewData
                else p
              case None => params.limitNewData // na.fill new-key semantics
            }
            prev = Some(avg)
            if (avg.toDouble / baseline > params.quotientAmplification)
              Some(SpikeAlert(ws, key._1, key._2, baseline, key._3))
            else None
          }

          state.update(DetectState(open, prev))
          // wake when the oldest open window becomes closable; keys
          // with no open windows keep prevAvg and wait for data
          if (open.nonEmpty)
            state.setTimeoutTimestamp((open.keys.min + windowSec) * 1000)
          alerts.iterator
      }
  }
}
