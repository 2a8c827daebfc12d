package graft.app

import java.nio.file.Paths
import graft.sources.HourlyParquetSource

/** Application entry point — the reference's `__main__` block
  * (hha.py:331–347): load config, start the watch-list refresh
  * daemon, run the scheduler loop forever.
  *
  * Usage: Main [hha.conf] [dataDir] [watchlistFile]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val config = args.headOption
      .map(p => HhaConfig.load(Paths.get(p)))
      .getOrElse(HhaConfig())

    val spark = graft.core.GraftSession.local(config.appName)
    val dataDir = args.lift(1).getOrElse(s"/${config.hdfsFileDir}")
    val source = new HourlyParquetSource(spark, dataDir)

    val watchlist = args.lift(2) match {
      case Some(u) if u.startsWith("http://") || u.startsWith("https://") =>
        // live Consul KV feed (hha.py:41–71): recursive get under the
        // configured prefix; the first fetch is fail-fast like the
        // reference, later refreshes keep the previous snapshot
        val w = new ConsulWatchlist(u, config.consulDir)
        startRefreshDaemon(() => w.refresh())
        w
      case Some(p) =>
        val w = new FileWatchlist(Paths.get(p))
        startRefreshDaemon(() => w.refresh())
        w
      case None => new StaticWatchlist(Set.empty)
    }

    new SpikeScheduler(source, config, watchlist, new LogRuleSink()).run()
  }

  /** Refresh every 300 s on a daemon thread (hha.py:71, 342) — atomic
    * snapshot swap, unlike the reference's in-place clear. A transient
    * failure (file mid-replace, Consul blip) must not kill the thread
    * and leave the watchlist silently stale; the previous snapshot
    * stays active until the next tick.
    */
  private def startRefreshDaemon(refresh: () => Unit): Unit = {
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(300000L)
        try refresh()
        catch { case e: Exception =>
          System.err.println(s"watchlist refresh failed, keeping previous snapshot: $e")
        }
      }
    }, "watchlist-refresh")
    t.setDaemon(true)
    t.start()
  }
}
