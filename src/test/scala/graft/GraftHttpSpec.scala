package graft

import graft.api.{GraftEngine, GraftHttp}
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** The reference lifecycle over real HTTP: write line protocol with an
  * InfluxDB-style client, query it back, ping. */
class GraftHttpSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val NowMs = 1735689600000L

  test("write → query → ping over HTTP, InfluxDB wire shapes") {
    val root = Files.createTempDirectory("graft-http").toString
    val engine = new GraftEngine(spark, root, () => NowMs)
    val http = new GraftHttp(engine)
    val port = http.start()
    try {
      val client = HttpClient.newHttpClient()
      def send(r: HttpRequest): HttpResponse[String] =
        client.send(r, HttpResponse.BodyHandlers.ofString())

      val ping = send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/ping")).build())
      assert(ping.statusCode() === 204)

      val write = send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/write?db=httpdb&precision=s"))
        .POST(HttpRequest.BodyPublishers.ofString(
          "cpu,host=a usage=42 1735689540\ncpu,host=a usage=44 1735689550"))
        .build())
      assert(write.statusCode() === 204)
      // /write admits before ingesting (reference behavior) — wait for the
      // rows to land before querying
      val deadline = System.nanoTime() + 30e9.toLong
      def rows(): Long =
        try engine.catalog("httpdb").measurements.get("cpu").map(_.count()).getOrElse(0L)
        catch { case scala.util.control.NonFatal(_) => 0L }
      while (rows() < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(rows() === 2)

      val q = java.net.URLEncoder.encode(
        """SELECT mean("usage") FROM "cpu" WHERE time > now() - 5m GROUP BY time(1m)""", "UTF-8")
      val res = send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/query?db=httpdb&q=$q")).build())
      assert(res.statusCode() === 200)
      assert(res.body().contains(""""name":"cpu""""), res.body())
      assert(res.body().contains("[1735689540000,43]"), res.body())

      // malformed query over the wire → clean empty result, 200
      val bad = send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/query?db=httpdb&q=NONSENSE")).build())
      assert(bad.statusCode() === 200 && bad.body().contains("results"))

      // gzip write body (Telegraf content_encoding="gzip" default shape)
      val baos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(baos)
      gz.write("cpu,host=a usage=46 1735689560".getBytes("UTF-8"))
      gz.close()
      val gzWrite = send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/write?db=httpdb&precision=s"))
        .header("Content-Encoding", "gzip")
        .POST(HttpRequest.BodyPublishers.ofByteArray(baos.toByteArray))
        .build())
      assert(gzWrite.statusCode() === 204)
      val deadline2 = System.nanoTime() + 30e9.toLong
      while (rows() < 3 && System.nanoTime() < deadline2) Thread.sleep(100)
      assert(rows() === 3)

      // InfluxDB 2.x write endpoint: bucket maps to db, token ignored
      val v2 = send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/api/v2/write?org=o&bucket=httpdb&precision=s"))
        .header("Authorization", "Token anything")
        .POST(HttpRequest.BodyPublishers.ofString("cpu,host=a usage=48 1735689570"))
        .build())
      assert(v2.statusCode() === 204)
      val deadline3 = System.nanoTime() + 30e9.toLong
      while (rows() < 4 && System.nanoTime() < deadline3) Thread.sleep(100)
      assert(rows() === 4)

      // chunked=true → newline-delimited JSON: one complete results doc
      // per statement of the batch
      val batch = java.net.URLEncoder.encode(
        """SHOW MEASUREMENTS; SHOW FIELD KEYS FROM "cpu"""", "UTF-8")
      val ch = send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/query?db=httpdb&q=$batch&chunked=true")).build())
      assert(ch.statusCode() === 200)
      val chunks = ch.body().split("\n").filter(_.nonEmpty)
      assert(chunks.length === 2, ch.body())
      chunks.foreach { c =>
        assert(c.startsWith("""{"results":[""") && c.endsWith("]}"), c)
      }
      assert(chunks(0).contains(""""measurements""""), chunks(0))

      // chunk_size=N: a series longer than N points splits into N-point
      // chunks, "partial":true on every chunk but the last (series AND
      // statement level, InfluxDB's flags). 4 raw points, N=3 → 2 chunks.
      val sel = java.net.URLEncoder.encode(
        """SELECT "usage" FROM "cpu" WHERE time > now() - 10m""", "UTF-8")
      val cs = send(HttpRequest.newBuilder(URI.create(
        s"http://localhost:$port/query?db=httpdb&q=$sel&chunked=true&chunk_size=3")).build())
      val parts = cs.body().split("\n").filter(_.contains(""""name":"cpu""""))
      assert(parts.length === 2, cs.body())
      assert(parts(0).contains(""""partial":true"""), parts(0))
      assert(parts(0).endsWith("""],"partial":true}]}"""), parts(0))
      assert(!parts(1).contains(""""partial""""), parts(1))
      val nPoints = parts.map("""\[17\d+""".r.findAllIn(_).length).toSeq
      assert(nPoints === Seq(3, 1), parts.mkString("\n"))

      // Accept-Encoding: gzip → compressed response body with the header
      val gzr = java.net.http.HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/query?db=httpdb&q=" +
            java.net.URLEncoder.encode("SHOW MEASUREMENTS", "UTF-8")))
          .header("Accept-Encoding", "gzip").build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      assert(gzr.statusCode() === 200)
      assert(gzr.headers().firstValue("Content-Encoding").orElse("") === "gzip")
      val unzipped = new String(
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(gzr.body())).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(unzipped.contains(""""measurements""""), unzipped)
    } finally http.stop()
  }
}
