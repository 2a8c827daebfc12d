package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input row of the temporal join: a probe event (`is_dim` false,
  * `id` = event id) or a dimension VERSION (`is_dim` true, `id` = the
  * version's payload key), both stamped with an event-time second.
  */
final case class TemporalRow(user_id: Long, is_dim: Boolean, id: Long, sec: Long)

/** One joined probe: the latest dimension version at or before the
  * probe's event time, or nulls if no version precedes it.
  */
final case class TemporalMatch(event_id: Long, user_id: Long, evt_sec: Long,
                               ord_sec: Option[Long], o_orderkey: Option[Long])

/** Per-key join state: retained dimension versions `(sec, id)` and
  * probes still waiting for the watermark `(event id, sec)`.
  */
final case class TemporalState(dims: Seq[(Long, Long)], pending: Seq[(Long, Long)])

/** Streaming temporal AS-OF join (Flink's "temporal table join",
  * SQL:2011 system-time semantics — the streaming twin of the native
  * batch as-of exec behind q11): probes and dimension-version updates
  * arrive as ONE keyed stream, and each probe is emitted exactly once,
  * joined to the LATEST version at or before its event time, once the
  * watermark proves no earlier version can still arrive. Structured
  * Streaming has stream-stream equi/interval joins but no as-of
  * semantics; this supplies them with `flatMapGroupsWithState`.
  *
  * Correctness protocol: a probe matures when `evt_sec < watermark` —
  * any not-yet-arrived version has `sec >= watermark > evt_sec` (the
  * watermark contract), so the match is final. Probes the watermark
  * has not reached wait in state; an event-time timeout at the
  * earliest pending probe + 1 s guarantees the group wakes to flush
  * them even if its key never receives another row.
  *
  * State bound (the 100 TB argument): pending probes are bounded by
  * the watermark delay × per-key arrival rate — the same bound as any
  * stream-stream join buffer — and versions are PRUNED to the latest
  * one at or before every possible future probe (min pending sec,
  * else the watermark) plus all later ones: a key's state carries its
  * version HORIZON, never its version history. One stateful shuffle
  * on the join key; emission is append-mode, each probe exactly once.
  */
object TemporalJoin {

  implicit private val outEnc: Encoder[TemporalMatch] = Encoders.product[TemporalMatch]
  implicit private val stateEnc: Encoder[TemporalState] = Encoders.product[TemporalState]
  implicit private val rowEnc: Encoder[TemporalRow] = Encoders.product[TemporalRow]
  implicit private val keyEnc: Encoder[Long] = Encoders.scalaLong

  def join(input: DataFrame, watermarkDelaySec: Long): Dataset[TemporalMatch] = {
    val withTime = input
      .withColumn("event_time", timestamp_seconds(col("sec")))
      .withWatermark("event_time", s"$watermarkDelaySec seconds")
      .as[TemporalRow]

    withTime
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[TemporalRow], state: GroupState[TemporalState]) =>
          val (next, out) = step(user,
            rows.toSeq, state.getOption.getOrElse(TemporalState(Nil, Nil)),
            state.getCurrentWatermarkMs() / 1000L)
          state.update(next)
          if (next.pending.nonEmpty)
            state.setTimeoutTimestamp((next.pending.map(_._2).min + 1) * 1000L)
          out.iterator
      }
  }

  /** One group invocation as a pure function (spec-testable): ingest
    * the batch's rows, emit every probe the watermark has finalized
    * (matched against ALL versions seen so far), and prune state.
    */
  private[streaming] def step(user: Long, rows: Seq[TemporalRow],
                              s0: TemporalState,
                              wm: Long): (TemporalState, Seq[TemporalMatch]) = {
    var dims = s0.dims
    var pend = s0.pending
    rows.foreach { r =>
      if (r.is_dim) dims = dims :+ (r.sec, r.id)
      else pend = pend :+ (r.id, r.sec)
    }
    val sorted = dims.sortBy(identity)

    val (ready, still) = pend.partition(_._2 < wm)
    val out = ready.sortBy(_._1).map { case (eid, esec) =>
      val m = sorted.takeWhile(_._1 <= esec).lastOption
      TemporalMatch(eid, user, esec, m.map(_._1), m.map(_._2))
    }

    // version pruning: every future probe has sec >= the watermark
    // (the late bound) and still-pending probes have sec >= wm too,
    // so only the latest version at or before that horizon — plus
    // everything after it — can ever match again
    val horizon = (still.map(_._2) :+ wm).min
    val (older, newer) = sorted.partition(_._1 <= horizon)
    (TemporalState(older.lastOption.toSeq ++ newer, still), out)
  }
}
