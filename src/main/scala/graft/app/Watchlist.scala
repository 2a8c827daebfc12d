package graft.app

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Pluggable watch-list source — the reference's Consul KV feed
  * (hha.py:41–71) behind an interface. Implementations expose an
  * immutable snapshot; refresh swaps it atomically (the reference
  * instead `clear()`s the shared set while the analysis thread reads
  * it, hha.py:51 vs 237 — a race we deliberately do not replicate).
  */
trait WatchlistProvider {
  /** Immutable current snapshot of watched IPv4 addresses (as longs). */
  def current: Set[Long]
  def contains(ip: Long): Boolean = current.contains(ip)
}

object Watchlist {

  /** Dotted-quad → IPv4-as-long; None on malformed input (the
    * reference logs and skips these, hha.py:65–66).
    */
  def parseIpv4(s: String): Option[Long] = {
    val parts = s.trim.split("\\.", -1)
    if (parts.length != 4) None
    else try {
      val octets = parts.map(_.toLong)
      if (octets.exists(o => o < 0 || o > 255)) None
      else Some(octets.foldLeft(0L)((acc, o) => (acc << 8) | o))
    } catch { case _: NumberFormatException => None }
  }

  /** Parse the reference's value format: newline-separated IPs,
    * `#`-prefixed comment lines skipped (hha.py:56–66).
    */
  def parseLines(lines: Iterator[String]): Set[Long] =
    lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(parseIpv4)
      .toSet

  /** Distributed variant for watch-lists that live in a table rather
    * than a small file: same comment/malformed semantics, parsing via
    * the native codegen'd `parse_ipv4` expression (GraftExtensions).
    * Collect stays small — it's the distinct parsed set.
    */
  def fromDataFrame(df: org.apache.spark.sql.DataFrame, entryCol: String): Set[Long] = {
    import org.apache.spark.sql.functions._
    df.select(trim(col(entryCol)).as("e"))
      .filter(col("e") =!= "" && !col("e").startsWith("#"))
      .select(expr("parse_ipv4(e)").as("ip"))
      .filter(col("ip").isNotNull)
      .distinct()
      .collect().map(_.getLong(0)).toSet
  }
}

/** Fixed in-memory watch-list (tests, static deployments). */
final class StaticWatchlist(ips: Set[Long]) extends WatchlistProvider {
  def current: Set[Long] = ips
}

/** File-backed watch-list with atomic snapshot swap on refresh — the
  * batch-parity stand-in for the Consul poller (FIXTURES.md A3).
  * A scheduler thread may call refresh() concurrently with readers:
  * `current` always observes a complete snapshot.
  */
final class FileWatchlist(path: Path) extends WatchlistProvider {
  @volatile private var snapshot: Set[Long] = Set.empty
  refresh()

  def refresh(): Unit =
    snapshot = Watchlist.parseLines(Files.readAllLines(path).asScala.iterator)

  def current: Set[Long] = snapshot
}
