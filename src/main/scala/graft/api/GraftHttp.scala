package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's HTTP surface (Express app, cflux.js:282-864) over
  * [[GraftEngine]], using the JDK's built-in HttpServer — no added
  * dependencies, so the adapter stays a thin shell over the library API:
  *
  *  - `POST /write?db=X[&precision=ns|u|us|ms|s]` → 204 (cflux.js:298-352;
  *    like the reference, the status is committed before heavy work —
  *    at-most-once admission)
  *  - `GET|POST /query?db=X&q=...` → 200 InfluxDB-shaped JSON
  *    (cflux.js:374-852)
  *  - `GET /ping` → 204 (cflux.js:861-864)
  *
  * An InfluxDB line-protocol client (Telegraf, influx CLI) pointed at
  * this port speaks to the engine exactly as it would to the reference.
  */
final class GraftHttp(engine: GraftEngine, port: Int = 0,
                      bindAddress: String = "127.0.0.1") {

  // loopback by default: the engine exposes unauthenticated write/DROP/
  // DELETE, so a wider bind must be an explicit caller decision
  private val server =
    HttpServer.create(new InetSocketAddress(bindAddress, port), 0)

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap
  }

  /** Request body, transparently gunzipped when Content-Encoding: gzip —
    * InfluxDB clients (Telegraf `content_encoding = "gzip"`, the influx
    * CLI) compress write bodies by default at any real batch size. */
  private def body(ex: HttpExchange): String = {
    val gz = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
      .exists(_.toLowerCase.contains("gzip"))
    val in =
      if (gz) new java.util.zip.GZIPInputStream(ex.getRequestBody)
      else ex.getRequestBody
    new String(in.readAllBytes(), StandardCharsets.UTF_8)
  }

  private def respond(ex: HttpExchange, code: Int, payload: String = ""): Unit = {
    val raw = payload.getBytes(StandardCharsets.UTF_8)
    // gzip the body when the client advertises it (InfluxDB compresses
    // query responses the same way; result JSON compresses ~10x)
    val gz = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase.contains("gzip")) && raw.length > 0
    val bytes =
      if (gz) {
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.util.zip.GZIPOutputStream(bos)
        out.write(raw); out.close()
        bos.toByteArray
      } else raw
    if (payload.nonEmpty) {
      ex.getResponseHeaders.set("Content-Type", "application/json")
      if (gz) ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    } else ex.sendResponseHeaders(code, -1)
    ex.close()
  }

  server.createContext("/ping", (ex: HttpExchange) => respond(ex, 204))

  private def handleWrite(ex: HttpExchange, db: String, precision: String): Unit = {
    val lines = body(ex)
    // reference sends 204 before flushing (cflux.js:351) — we admit, then
    // ingest; a failed ingest logs rather than failing the client
    respond(ex, 204)
    try engine.write(db, lines, precision)
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"[graft-http] write failed: $e") }
  }

  server.createContext("/write", (ex: HttpExchange) => {
    val p = params(ex)
    handleWrite(ex, p.getOrElse("db", ""), p.getOrElse("precision", "ns"))
  })

  // InfluxDB 2.x write endpoint: Telegraf's v2 output and the v2 client
  // libraries POST line protocol to /api/v2/write?org=...&bucket=...
  // (precision defaults to ns like v1). bucket maps to the database; org
  // and the Authorization token are accepted and ignored (no auth
  // subsystem — same posture as the v1 surface).
  server.createContext("/api/v2/write", (ex: HttpExchange) => {
    val p = params(ex)
    handleWrite(ex, p.getOrElse("bucket", ""), p.getOrElse("precision", "ns"))
  })

  server.createContext("/query", (ex: HttpExchange) => {
    val p = params(ex)
    // q may arrive as a query param (GET) or form body (POST)
    val fromBody = if (ex.getRequestMethod == "POST") {
      body(ex).split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap
    } else Map.empty[String, String]
    val db = p.getOrElse("db", fromBody.getOrElse("db", ""))
    val q = p.getOrElse("q", fromBody.getOrElse("q", ""))
    val epoch = p.get("epoch").orElse(fromBody.get("epoch"))
    // chunked=true → newline-delimited JSON, one {"results":[...]} doc
    // per results entry; chunk_size=N additionally splits each series
    // into N-point partial chunks (InfluxDB chunked responses)
    val chunked = p.get("chunked").orElse(fromBody.get("chunked")).contains("true")
    val chunkSize = p.get("chunk_size").orElse(fromBody.get("chunk_size"))
      .flatMap(_.toIntOption).filter(_ > 0)
    try {
      if (chunked) respondStream(ex, engine.queryChunkStream(db, q, epoch, chunkSize))
      else respond(ex, 200, engine.query(db, q, epoch))
    }
    catch { case scala.util.control.NonFatal(_) => respond(ex, 200, graft.query.Response.emptyResult) }
  })

  /** Newline-delimited streaming response (chunked transfer encoding):
    * each results document is written as the engine produces it, so
    * driver/server memory never holds the full result — the whole point
    * of `chunked=true` (reference streams rows, cflux.js:792-810).
    * Honors Accept-Encoding: gzip by wrapping the stream. */
  private def respondStream(ex: HttpExchange, docs: Iterator[String]): Unit = {
    val gz = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase.contains("gzip"))
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (gz) ex.getResponseHeaders.set("Content-Encoding", "gzip")
    ex.sendResponseHeaders(200, 0) // length 0 → chunked transfer encoding
    val out =
      if (gz) new java.util.zip.GZIPOutputStream(ex.getResponseBody)
      else ex.getResponseBody
    try docs.foreach { d => out.write((d + "\n").getBytes(StandardCharsets.UTF_8)) }
    finally { out.close(); ex.close() }
  }

  /** Bind and serve; returns the bound port (useful with port=0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)
}
