package graft

/** The loaded-RUN detector Bench's per-entry sentinel cannot be
  * (VERDICT r13 ask #2): the per-entry gate compares each sample's
  * sentinel against the run's OWN first-five floor, so a UNIFORMLY
  * loaded window inflates the floor and every entry reads "clean" —
  * BENCH_r13 shipped a ~1.35×-inflated draw with `contended: []` and
  * 39 phantom regressions. When a committed control draw is present,
  * the RUN itself is gated on the ratio of this run's sentinel floor
  * to the control draw's recorded floor; past [[FloorInflation]] the
  * bench first re-draws the floor (the burst may pass), and if it
  * stays hot stamps the artifact `"contended_run": true` so nobody
  * reads phantom movers again. Pure function, pinned by
  * BenchGuardsSpec with fabricated floors.
  */
object BenchGuards {

  /** ~1.5×: far above the floor's idle run-to-run jitter (min-of-5 of
    * a ~0.1–0.5 s fixed job is stable to a few percent), far below the
    * ~2.9× inflation that slipped through in r13.
    */
  val FloorInflation = 1.5

  def contendedRun(currentFloor: Double, controlFloor: Option[Double],
                   inflation: Double = FloorInflation): Boolean =
    controlFloor.exists(cf => cf > 0.0 && currentFloor > cf * inflation)

  /** One sentinel reading vs the run's floor — the shared hot test. */
  def hot(sentinel: Double, floor: Double,
          inflation: Double = FloorInflation): Boolean =
    floor > 0.0 && sentinel > floor * inflation

  /** The MID-RUN burst tracker (VERDICT r14 ask #2): the run-level
    * floor gate samples contention once at run START, and the
    * per-entry sentinel only brackets entries whose first run exceeds
    * the gate — so a burst arriving mid-run inflated sub-threshold
    * entries silently (BENCH_r14 shipped x75 at 27.5 s vs a 2.58 s
    * clean min with `contended_run: false`; a >HeavySecs burst can
    * also end before its own sentinel runs, slipping the bracket).
    * This tracker threads EVERY sentinel reading — the heavy branch's
    * own gates plus a forced reading at least every [[maxSpan]]
    * completed entries — and attributes a HOT reading to every entry
    * whose samples ran since the last CLEAN one: those are the
    * suspects the bench re-draws (budget permitting) or stamps into
    * `contended`. Pure bookkeeping, pinned by BenchGuardsSpec with
    * fabricated readings.
    */
  final class BurstTracker(floor: Double, maxSpan: Int = 4,
                           inflation: Double = FloorInflation) {
    private val pending = scala.collection.mutable.ListBuffer.empty[String]
    private var sinceReading = 0

    /** Record a completed entry; true = the span is due a reading. */
    def ran(name: String): Boolean = {
      pending += name
      sinceReading += 1
      sinceReading >= maxSpan
    }

    /** Consume a sentinel reading (drawn for any reason). Returns the
      * suspect entries on a hot reading — everything completed since
      * the last clean reading; a clean reading vouches for them.
      */
    def observed(sentinel: Double): Seq[String] = {
      sinceReading = 0
      val out = if (hot(sentinel, floor, inflation)) pending.toList else Nil
      pending.clear()
      out
    }
  }
}
