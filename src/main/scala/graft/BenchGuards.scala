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
}
