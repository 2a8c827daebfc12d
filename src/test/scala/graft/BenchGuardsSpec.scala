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

  test("a fabricated MID-RUN burst: the tracker attributes a hot reading " +
    "to exactly the entries since the last clean one (VERDICT r14 ask #2)") {
    val t = new BenchGuards.BurstTracker(floor = 0.1, maxSpan = 4)
    // entries complete under a quiet sentinel — no reading due yet
    assert(!t.ran("a") && !t.ran("b") && !t.ran("c"))
    // span reached → the caller draws; the reading is CLEAN → vouched
    assert(t.ran("d"))
    assert(t.observed(0.12) === Nil)
    // the burst arrives mid-run: the next window's entries are the
    // suspects — and ONLY they are (a–d were vouched by the clean
    // reading; exactly the x75-in-BENCH_r14 hole)
    t.ran("e"); t.ran("f")
    assert(t.observed(0.5) === Seq("e", "f"),
      "a hot reading must surface everything since the last clean one")
    // the suspect list was handed off — a follow-up reading only
    // covers NEW completions
    t.ran("g")
    assert(t.observed(0.5) === Seq("g"))
    // a heavy entry's own gate reading (drawn before the span) also
    // feeds the tracker: clean → clears, and the span counter resets
    t.ran("h")
    assert(t.observed(0.1) === Nil)
    assert(!t.ran("i") && !t.ran("j") && !t.ran("k"))
    assert(t.ran("l"), "the span must be measured from the last reading")
  }
}
