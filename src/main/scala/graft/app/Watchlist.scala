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
    // Delegate to the same byte-level parser the codegen'd ParseIpv4
    // expression runs — String.toLong-based splitting admitted '+1'
    // signs and non-ASCII Unicode digits here that the DataFrame path
    // rejected (ADVICE r3); one parser, one semantics.
    val r = graft.functions.ParseIpv4Helper.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString(s.trim))
    if (r < 0) None else Some(r)
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
