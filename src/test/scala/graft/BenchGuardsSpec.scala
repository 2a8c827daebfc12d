package graft

import org.scalatest.funsuite.AnyFunSuite

/** The loaded-RUN gate (VERDICT r13 ask #2), pinned on fabricated
  * floors — exactly the draw that slipped through in r13 (own floor
  * 0.505 s vs the control's 0.175 s, ~2.9×, `contended: []`).
  */
class BenchGuardsSpec extends AnyFunSuite {

  test("the r13 loaded draw trips the gate; an idle draw does not") {
    // the real BENCH_r13 numbers: 2.9x the control floor — must trip
    assert(BenchGuards.contendedRun(0.505, Some(0.175)))
    // idle jitter (few percent around the control floor) — clean
    assert(!BenchGuards.contendedRun(0.175, Some(0.175)))
    assert(!BenchGuards.contendedRun(0.190, Some(0.175)))
    // just under and just over the 1.5x line
    assert(!BenchGuards.contendedRun(0.262, Some(0.175)))
    assert(BenchGuards.contendedRun(0.263, Some(0.175)))
  }

  test("no control floor (first round, pre-r14 control file, cross-sf " +
    "run) means no verdict — never a false positive") {
    assert(!BenchGuards.contendedRun(99.0, None))
    // a zero/garbage recorded floor must not divide into a verdict
    assert(!BenchGuards.contendedRun(99.0, Some(0.0)))
    assert(!BenchGuards.contendedRun(99.0, Some(-1.0)))
  }
}
