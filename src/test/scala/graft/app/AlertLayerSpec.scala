package graft.app

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.reference.{Alert, AlertDedup}

class AlertLayerSpec extends AnyFunSuite {

  private val a1 = Alert(65, 11, 174, 174327451L)
  private val a2 = Alert(68, 11, 174, 174327451L)

  test("TTL dedup: repeat alerts suppressed within TTL, re-fire exactly at TTL " +
    "(hha.py:234-244)") {
    val d = new AlertDedup(300L)
    val all = (_: Long) => true
    assert(d.process(Seq(a1), all, now = 1000L) === Seq(a1))
    assert(d.process(Seq(a1), all, now = 1100L) === Seq.empty)      // tracked
    assert(d.process(Seq(a1), all, now = 1299L) === Seq.empty)      // 299 < 300
    assert(d.process(Seq(a1), all, now = 1300L) === Seq(a1))        // expired at >= TTL
  }

  test("only watch-listed addresses fire, and only they enter the TTL map " +
    "(hha.py:237-238)") {
    val d = new AlertDedup(300L)
    val watch = (ip: Long) => ip == a1.dstIp
    assert(d.process(Seq(a1, a2.copy(dstIp = 42L)), watch, 1000L) === Seq(a1))
    assert(d.trackedKeys === 1) // the unwatched key was NOT stamped
    // an address added to the watch-list later can still fire
    assert(d.process(Seq(a2.copy(dstIp = 42L)), _ => true, 1001L).nonEmpty)
  }

  test("duplicate keys within one batch: first occurrence wins") {
    val d = new AlertDedup(300L)
    assert(d.process(Seq(a1, a1, a1), _ => true, 1000L) === Seq(a1))
  }

  test("watch-list parsing: comments and malformed lines skipped " +
    "(hha.py:56-66, FIXTURES.md A3)") {
    val got = Watchlist.parseLines(Iterator(
      "10.100.67.139", "# comment line", "  ", "not-an-ip", "1.2.3.999",
      "192.168.1.1 "))
    assert(got === Set(174343051L, 3232235777L))
  }

  test("FileWatchlist refresh swaps snapshots atomically") {
    val f = Files.createTempFile("watch", ".txt")
    Files.writeString(f, "10.0.0.1\n")
    val w = new FileWatchlist(f)
    assert(w.current === Set(167772161L))
    Files.writeString(f, "10.0.0.2\n# 10.0.0.1 removed\n")
    w.refresh()
    assert(w.current === Set(167772162L))
  }

  test("rule sinks: log line shape and collecting buffer") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    new LogRuleSink(lines += _).emit(a1)
    assert(lines.head.contains("ip = 10.100.6.155") && lines.head.contains("type protocol 11"))
    val c = new CollectingRuleSink
    c.emit(a1); c.emit(a2)
    assert(c.alerts === Seq(a1, a2))
  }
}
