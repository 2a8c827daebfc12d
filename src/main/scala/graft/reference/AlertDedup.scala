package graft.reference

import scala.collection.mutable

/** One spike alert as collected from the pipeline's output frame
  * (hha.py:231–233 tuple order: num_protocol, type_proto, baseline
  * aka prev_sum_val, dst_ip — the net branch carries the /24 address
  * in dstIp).
  */
final case class Alert(numProtocol: Int, typeProto: Int, baseline: Int, dstIp: Long)

/** Exact sequential TTL alert dedup — the reference's driver-side
  * `GlobalRowList` semantics (hha.py:231–244), replicated precisely:
  *
  *   - alerts are processed in collect order;
  *   - an alert passes only if its key (num_protocol, type_proto,
  *     dst_ip) is NOT currently tracked AND the address is on the
  *     watch-list (hha.py:234–237 — the membership test runs only for
  *     untracked keys, and only watched keys enter the map);
  *   - passed keys are stamped with the batch time;
  *   - entries with `now - stamp >= ttlSec` expire (hha.py:244 keeps
  *     strictly-younger entries), so a key alerts again exactly at
  *     the TTL boundary. One deliberate refinement: the sweep runs
  *     BEFORE the batch (the reference sweeps after, hha.py:244,
  *     which delays an exactly-at-boundary re-alert to the following
  *     pass — an artifact of pass cadence, not intent).
  *
  * Driver-side state is the right scale call here: the alert stream
  * is post-aggregation and post-filter (hundreds of rows), not the
  * 100 TB input. The streaming variant keeps the same semantics in
  * executor state via flatMapGroupsWithState (graft.streaming).
  */
final class AlertDedup(ttlSec: Long) {

  private val seen = mutable.Map.empty[(Int, Int, Long), Long]

  /** Current tracked-key count (monitoring/tests). */
  def trackedKeys: Int = seen.size

  /** Process one collected batch at time `now`; returns the alerts
    * that survive dedup + watch-list filtering, in input order.
    */
  def process(alerts: Seq[Alert], watchlist: Long => Boolean, now: Long): Seq[Alert] = {
    seen.filterInPlace { case (_, stamp) => now - stamp < ttlSec }
    alerts.filter { a =>
      val key = (a.numProtocol, a.typeProto, a.dstIp)
      !seen.contains(key) && watchlist(a.dstIp) && {
        seen(key) = now
        true
      }
    }
  }
}
