package graft.app

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** ConsulWatchlist against a localhost stub serving Consul's
  * recursive-KV JSON shape — verifies the HTTP path, base64 value
  * decoding, the shared comment/malformed-line semantics, null-Value
  * keys, atomic refresh swap, and error propagation (no egress: the
  * stub is an in-process JDK HttpServer).
  */
class ConsulWatchlistSpec extends AnyFunSuite {

  private def b64(s: String) = Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def kvJson(values: Option[String]*): String =
    values.zipWithIndex.map { case (v, i) =>
      val value = v.map(x => "\"" + b64(x) + "\"").getOrElse("null")
      s"""{"LockIndex":0,"Key":"config/prefix/k$i","Flags":0,"Value":$value,"CreateIndex":$i,"ModifyIndex":$i}"""
    }.mkString("[", ",", "]")

  /** Serve `body()` at /v1/kv/... on an ephemeral port; run f(baseUrl). */
  private def withServer(status: () => Int, body: () => String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/kv/", { exchange =>
      val bytes = body().getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status(), bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("parses recursive KV: base64 values, multi-line, comments, malformed, null Value") {
    val json = kvJson(
      Some("10.0.0.1\n# a comment\n10.0.0.2\nnot-an-ip\n999.1.1.1"),
      None, // key with no value — skipped like the reference's None check
      Some("192.168.1.1"))
    withServer(() => 200, () => json) { base =>
      val w = new ConsulWatchlist(base, "config/prefix/")
      assert(w.current === Set(
        (10L << 24) | 1L, (10L << 24) | 2L,
        (192L << 24) | (168L << 16) | (1L << 8) | 1L))
    }
  }

  test("refresh swaps the snapshot atomically when the KV content changes") {
    @volatile var payload = kvJson(Some("10.0.0.1"))
    withServer(() => 200, () => payload) { base =>
      val w = new ConsulWatchlist(base, "config/prefix")
      assert(w.current === Set((10L << 24) | 1L))
      payload = kvJson(Some("10.0.0.9"))
      w.refresh()
      assert(w.current === Set((10L << 24) | 9L))
    }
  }

  test("failed refresh throws and keeps the previous snapshot") {
    @volatile var status = 200
    withServer(() => status, () => kvJson(Some("10.0.0.1"))) { base =>
      val w = new ConsulWatchlist(base, "config/prefix")
      status = 500
      intercept[java.io.IOException] { w.refresh() }
      assert(w.current === Set((10L << 24) | 1L)) // snapshot untouched
    }
  }

  test("construction is fail-fast when Consul is unreachable (reference parity)") {
    intercept[Exception] {
      // closed port on localhost — connect refused, no egress
      new ConsulWatchlist("http://127.0.0.1:1", "config/prefix", connectTimeoutMs = 500)
    }
  }
}
