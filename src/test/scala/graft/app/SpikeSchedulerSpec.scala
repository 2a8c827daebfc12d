package graft.app

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.SparkTestSession
import graft.sources.HourlyParquetSource

/** End-to-end smoke (SURVEY.md §7 step 6): hourly files on disk →
  * HourlyParquetSource discovery → SpikeDetector → AlertDedup →
  * watch-list → sink, with an injected clock.
  */
class SpikeSchedulerSpec extends AnyFunSuite with SparkTestSession {

  private val Now = 720000L // hour boundary x200
  private val spikingIp = 3232235777L // 192.168.1.1

  private def writeHourlyFiles(dir: String): Unit = {
    val curHour = Now / 3600 * 3600
    // previous-hour file: baseline traffic (ts < Now-300)
    histDf(
      (Now - 400L, 1L, 65, 174L, 11, spikingIp),
      (Now - 400L, 1L, 70, 500L, 31, 174327451L))
      .coalesce(1).write.parquet(s"$dir/level_${curHour - 3600}")
    // current-hour file: the spike + steady key. ts sits slightly
    // ahead of Now so the open-ended `ts > now-90` window still
    // covers these rows on the test's later (TTL-expiry) passes.
    histDf(
      (Now + 305L, 1L, 65, 961L, 11, spikingIp),
      (Now + 305L, 1L, 70, 505L, 31, 174327451L))
      .coalesce(1).write.parquet(s"$dir/level_$curHour")
  }

  test("hourly source: filename arithmetic + existence probing (hha.py:286-301)") {
    val dir = Files.createTempDirectory("hours").toString
    writeHourlyFiles(dir)
    val src = new HourlyParquetSource(spark, dir, clock = () => Now)
    val curHour = Now / 3600 * 3600
    assert(src.candidatePaths(2) ===
      Seq(s"$dir/level_$curHour", s"$dir/level_${curHour - 3600}"))
    assert(src.existingPaths(3).size === 2) // 3rd hour file doesn't exist
    assert(src.read(2).get.count() === 4)
    assert(new HourlyParquetSource(spark, dir, clock = () => Now + 86400L)
      .read(2).isEmpty) // a day later: no files for those hours
  }

  test("scheduler pass: spike detected, watch-list filtered, TTL suppressed " +
    "on the next pass") {
    val dir = Files.createTempDirectory("hours2").toString
    writeHourlyFiles(dir)
    var now = Now
    val sink = new CollectingRuleSink
    val sched = new SpikeScheduler(
      new HourlyParquetSource(spark, dir, clock = () => now),
      HhaConfig(),
      new StaticWatchlist(Set(spikingIp)), // the /24 net addr is NOT watched
      sink,
      clock = () => now,
      sleeper = _ => ())

    val first = sched.runOnce()
    assert(first.map(a => (a.numProtocol, a.dstIp, a.baseline)) ===
      Seq((65, spikingIp, 174)))

    now += 10 // second pass within TTL: same spike, suppressed
    assert(sched.runOnce() === Seq.empty)

    now += HhaConfig().limitDetectTimeSec // past TTL: fires again
    assert(sched.runOnce().size === 1)
    assert(sink.alerts.size === 2)
  }

  test("scheduler skips cleanly when no hour files exist (hha.py:138-139)") {
    val empty = Files.createTempDirectory("nohours").toString
    val sched = new SpikeScheduler(
      new HourlyParquetSource(spark, empty, clock = () => Now),
      HhaConfig(), new StaticWatchlist(Set.empty), new CollectingRuleSink,
      clock = () => Now, sleeper = _ => ())
    assert(sched.runOnce() === Seq.empty)
  }
}
