package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.reference.Alert

/** A timestamped alert flowing through the streaming dedup. */
final case class AlertEvent(alert: Alert, ts: Long)

/** Streaming-native TTL alert dedup: the reference's driver-side
  * `GlobalRowList` (hha.py:234–244) as distributed per-key state via
  * `flatMapGroupsWithState` — state lives with the executors, scales
  * with distinct alerting keys, and survives restarts through the
  * checkpoint (none of which the driver-map batch variant offers).
  *
  * Semantics match [[graft.reference.AlertDedup]]: within one batch
  * events are ordered by ts; a key fires when untracked or when
  * `ts - lastFire >= ttlSec` (expiry exactly at the boundary).
  */
object StreamingAlertDedup {

  implicit private val alertEnc: Encoder[Alert] = Encoders.product[Alert]
  implicit private val stateEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val keyEnc: Encoder[(Int, Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong)

  def dedup(events: Dataset[AlertEvent], ttlSec: Long): Dataset[Alert] =
    events
      .groupByKey(e => (e.alert.numProtocol, e.alert.typeProto, e.alert.dstIp))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int, Long), events: Iterator[AlertEvent], state: GroupState[Long]) =>
          val out = Seq.newBuilder[Alert]
          var lastFire = state.getOption
          events.toSeq.sortBy(_.ts).foreach { e =>
            if (lastFire.forall(t => e.ts - t >= ttlSec)) {
              out += e.alert
              lastFire = Some(e.ts)
            }
          }
          lastFire.foreach(state.update)
          out.result().iterator
      }
}
