package graft.tools

import graft.api.{GraftEngine, GraftHttp}
import org.apache.spark.sql.SparkSession

/** Stand-alone HTTP server for wire-compatibility smoke testing
  * (`tools/wire_smoke.sh`): boots the engine over a scratch store, binds
  * [[GraftHttp]] on the requested port, prints `READY <port>`, and
  * blocks until killed — the process a real Telegraf (or any InfluxDB
  * v1/v2 client) points at.
  *
  * usage: runMain graft.tools.WireServer [port] [storeDir] [nowMs]
  * (port 0 = ephemeral; storeDir defaults to a temp dir; nowMs pins the
  * engine clock so relative-time queries in the smoke are reproducible —
  * pass 0 or omit for wall clock) */
object WireServer {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val store = args.lift(1).filter(_.nonEmpty).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-wire").toString)
    val nowMs: () => Long = args.lift(2).map(_.toLong).filter(_ > 0)
      .map(fixed => () => fixed)
      .getOrElse(() => System.currentTimeMillis())
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new GraftEngine(spark, store, nowMs)
    val http = new GraftHttp(engine, port)
    val bound = http.start()
    // the contract line wire_smoke.sh waits for — keep stdout flushed
    println(s"READY $bound")
    Console.out.flush()
    Thread.currentThread().join() // serve until killed
  }
}
