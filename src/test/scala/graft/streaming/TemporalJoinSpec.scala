package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pure-step invariants of the streaming temporal as-of join that the
  * st26 oracle row (hash-equality with q11's batch as-of answer)
  * cannot express: exactly-when emission, version pruning, and the
  * cross-batch match that makes the state machine necessary.
  */
class TemporalJoinSpec extends AnyFunSuite {

  private def dim(sec: Long, id: Long) =
    TemporalRow(1L, is_dim = true, id, sec)
  private def probe(id: Long, sec: Long) =
    TemporalRow(1L, is_dim = false, id, sec)
  private val empty = TemporalState(Nil, Nil)

  test("a probe waits for the watermark, then matches the latest prior version") {
    // batch 1: versions at 10 and 20, probe at 15 — watermark still 0
    val (s1, out1) = TemporalJoin.step(1L,
      Seq(dim(10, 100), dim(20, 200), probe(7, 15)), empty, wm = 0)
    assert(out1.isEmpty, "nothing can finalize before the watermark moves")
    assert(s1.pending === Seq((7L, 15L)))
    // batch 2 (empty — the timeout invocation): watermark passed 15
    val (s2, out2) = TemporalJoin.step(1L, Nil, s1, wm = 16)
    assert(out2 === Seq(TemporalMatch(7, 1, 15, Some(10), Some(100))),
      "match is the latest version at or before the probe, not the newest")
    assert(s2.pending.isEmpty)
  }

  test("a probe before any version emits nulls; a later probe sees the later version") {
    val (s1, _) = TemporalJoin.step(1L,
      Seq(dim(10, 100), dim(20, 200), probe(1, 5), probe(2, 25)), empty, wm = 0)
    val (_, out) = TemporalJoin.step(1L, Nil, s1, wm = 30)
    assert(out === Seq(
      TemporalMatch(1, 1, 5, None, None),
      TemporalMatch(2, 1, 25, Some(20), Some(200))))
  }

  test("cross-batch: a version from batch 1 matches a probe from batch 2") {
    val (s1, _) = TemporalJoin.step(1L, Seq(dim(10, 100)), empty, wm = 0)
    val (s2, out2) = TemporalJoin.step(1L, Seq(probe(9, 50)), s1, wm = 40)
    assert(out2.isEmpty, "probe at 50 is not final under wm 40")
    val (_, out3) = TemporalJoin.step(1L, Nil, s2, wm = 51)
    assert(out3 === Seq(TemporalMatch(9, 1, 50, Some(10), Some(100))))
  }

  test("version history prunes to the horizon: latest at-or-before wm plus newer") {
    val (s1, _) = TemporalJoin.step(1L,
      Seq(dim(10, 100), dim(20, 200), dim(30, 300), dim(40, 400)), empty, wm = 0)
    assert(s1.dims.size === 4, "nothing prunable at wm 0")
    val (s2, _) = TemporalJoin.step(1L, Nil, s1, wm = 35)
    // versions 10 and 20 are strictly dominated by 30 for every
    // possible future probe (sec >= 35); 30 must survive as the
    // latest-at-or-before-horizon, 40 as a future version
    assert(s2.dims === Seq((30L, 300L), (40L, 400L)))
    val (_, out) = TemporalJoin.step(1L, Seq(probe(5, 36)), s2, wm = 100)
    assert(out === Seq(TemporalMatch(5, 1, 36, Some(30), Some(300))),
      "pruning must not lose the match for a post-horizon probe")
  }

  test("pending probes protect the versions they still need") {
    val (s1, _) = TemporalJoin.step(1L,
      Seq(dim(10, 100), dim(20, 200), probe(3, 12)), empty, wm = 0)
    // wm 12: probe at 12 is NOT final (a version at 12 could arrive);
    // horizon = min(pending=12, wm=12) keeps version 10 alive
    val (s2, out) = TemporalJoin.step(1L, Nil, s1, wm = 12)
    assert(out.isEmpty)
    assert(s2.dims.contains((10L, 100L)),
      "version 10 is still the match for the pending probe at 12")
    val (_, out2) = TemporalJoin.step(1L, Nil, s2, wm = 13)
    assert(out2 === Seq(TemporalMatch(3, 1, 12, Some(10), Some(100))))
  }

  test("each probe emits exactly once across repeated invocations") {
    val (s1, o1) = TemporalJoin.step(1L, Seq(probe(1, 5)), empty, wm = 10)
    val (s2, o2) = TemporalJoin.step(1L, Nil, s1, wm = 20)
    val (_, o3) = TemporalJoin.step(1L, Nil, s2, wm = 30)
    assert(o1.map(_.event_id) === Seq(1L))
    assert(o2.isEmpty && o3.isEmpty)
  }
}
