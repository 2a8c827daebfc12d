package graft.app

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.Base64
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Live Consul KV watch-list provider — the reference's `fill_zones`
  * feed (hha.py:41–71) over Consul's HTTP API: recursive KV get under
  * a prefix, each key's base64 `Value` split into lines, `#` comments
  * and malformed entries skipped (same [[Watchlist.parseLines]]
  * semantics as the file provider, so all providers admit the same
  * entries).
  *
  * Differences from the reference, both deliberate:
  *   - refresh swaps an immutable snapshot atomically instead of
  *     `clear()`ing the shared set mid-read (hha.py:51 vs 237);
  *   - a failed refresh throws to the CALLER instead of
  *     `sys.exit(0)` (hha.py:54) — the scheduler loop in Main logs
  *     and keeps the previous snapshot, so one Consul blip doesn't
  *     kill the analysis (callers wanting the reference's fail-fast
  *     simply let the first [[refresh]] propagate at construction).
  *
  * Uses only JDK HTTP + the Jackson already on Spark's classpath —
  * no new dependencies.
  *
  * @param baseUrl e.g. "http://127.0.0.1:8500"
  * @param prefix  KV directory to fetch recursively (hha.conf's
  *                `consul_dir`)
  */
final class ConsulWatchlist(baseUrl: String, prefix: String,
                            connectTimeoutMs: Int = 5000,
                            readTimeoutMs: Int = 10000) extends WatchlistProvider {

  @volatile private var snapshot: Set[Long] = Set.empty
  refresh()

  def current: Set[Long] = snapshot

  /** Fetch + parse + atomically swap. Throws on connect/HTTP/parse
    * failure, leaving the previous snapshot in place.
    */
  def refresh(): Unit =
    snapshot = ConsulWatchlist.fetch(baseUrl, prefix, connectTimeoutMs, readTimeoutMs)
}

object ConsulWatchlist {

  private val mapper = new ObjectMapper

  /** One recursive KV GET → parsed IP set. Exposed for testing. */
  def fetch(baseUrl: String, prefix: String,
            connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000): Set[Long] = {
    val url = s"${baseUrl.stripSuffix("/")}/v1/kv/${prefix.stripPrefix("/")}?recurse=true"
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      if (code != 200)
        throw new java.io.IOException(s"Consul KV GET $url returned HTTP $code")
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      parseKvJson(body)
    } finally conn.disconnect()
  }

  /** Parse Consul's recursive-KV JSON (`[{"Key": ..., "Value":
    * <base64>|null, ...}, ...]`): decode every non-null value, split
    * into lines, apply the shared comment/malformed-entry rules.
    */
  def parseKvJson(json: String): Set[Long] = {
    val root = mapper.readTree(json)
    if (!root.isArray)
      throw new java.io.IOException(s"expected a JSON array from Consul KV, got: ${root.getNodeType}")
    val lines = root.elements().asScala.flatMap { entry =>
      val v = entry.get("Value")
      if (v == null || v.isNull) Iterator.empty
      else new String(Base64.getDecoder.decode(v.asText()), StandardCharsets.UTF_8)
        .linesIterator
    }
    Watchlist.parseLines(lines)
  }
}
