package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** `transformWithState` processor (the operator-state API that
  * supersedes flatMapGroupsWithState in Spark 4): per-key running
  * (count, sum) in a typed [[ValueState]], emitted ON DEMAND — a
  * data row folds into state and emits nothing; a row with
  * `query = true` snapshots the key's totals. Splitting mutation from
  * emission keeps the output independent of intra-batch row order
  * (counts are commutative; emission happens at most once per key per
  * batch), which is what makes a stateful processor oracle-checkable.
  *
  * Scale: state is one (long, long) per key in the RocksDB store
  * (transformWithState's required provider) — the store scales to
  * keys × O(16 B), not to input volume, and TTL would bound even that
  * ([[TTLConfig]]; NONE here — the totals are meant to live forever).
  *
  * Input (key, value, query); output (key, n, total).
  */
class RunningTotalsProcessor
    extends StatefulProcessor[String, (String, Long, Boolean), (String, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Boolean)],
                               timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var (n, sum) = if (totals.exists()) totals.get() else (0L, 0L)
    var emit = false
    rows.foreach { case (_, v, isQuery) =>
      if (isQuery) emit = true
      else { n += 1; sum += v }
    }
    totals.update((n, sum))
    if (emit) Iterator.single((key, n, sum)) else Iterator.empty
  }
}
