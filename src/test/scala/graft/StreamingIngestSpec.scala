package graft

import graft.pipeline.TextOps
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming ingest semantics T1-T5 (SURVEY §2.9) via MemoryStream. */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val NowMs = 1735689600000L

  test("micro-batches land in hour partitions; series index dedups across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream").toString
    val (samples, series, ckpt) = (s"$dir/samples", s"$dir/series", s"$dir/ckpt")

    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val stream = MemoryStream[String]
    val q = StreamingIngest.start(stream.toDS(), StreamingIngest.Config(
      samples, series, ckpt, fixedNowMs = Some(NowMs),
      onBatch = Some(b => seen.addAndGet(b.count().toInt))))

    // batch 1: two series, explicit ns timestamps in two different hours
    stream.addData(
      "cpu,host=a usage=1.5 1735689600000000000",
      "cpu,host=b usage=2.5 1735693200000000000")
    q.processAllAvailable()
    // batch 2: one repeated series (no new registration), one new series,
    // one LATE point (T3: lands in its own old hour partition)
    stream.addData(
      "cpu,host=a usage=3.5 1735689660000000000",
      "cpu,host=c usage=4.5 1735693260000000000",
      "cpu,host=a usage=9.9 1735686000000000000")
    q.processAllAvailable()
    q.stop()

    val s = spark.read.parquet(samples)
    assert(s.count() === 5)
    // hour partitioning: 1735686000000/3.6e6=482135 (late), 482136, 482137
    val hours = s.select("hour").distinct().as[Long].collect().sorted
    assert(hours === Array(482135L, 482136L, 482137L))
    // late row landed in ITS hour, not arrival hour (T3)
    assert(s.filter(col("hour") === 482135L).count() === 1)

    // T4: three distinct series registered exactly once each
    val idx = spark.read.parquet(series)
    assert(idx.count() === 3)
    assert(idx.select("fingerprint").distinct().count() === 3)

    // S9 fan-out saw every raw line
    assert(seen.get() === 5)
  }

  test("file source with maxFilesPerTrigger bounds each micro-batch (count-flush analogue)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-filesrc").toString
    val (in, samples, series, ckpt) =
      (s"$dir/in", s"$dir/samples", s"$dir/series", s"$dir/ckpt")
    new java.io.File(in).mkdirs()
    // two files, one point each; maxFilesPerTrigger=1 → two micro-batches
    Files.writeString(java.nio.file.Path.of(in, "a.lp"),
      "cpu,host=a usage=1 1735689600000000000\n")
    Files.writeString(java.nio.file.Path.of(in, "b.lp"),
      "cpu,host=b usage=2 1735689660000000000\n")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = StreamingIngest.start(
      StreamingIngest.fileLines(spark, in, maxFilesPerTrigger = 1),
      StreamingIngest.Config(samples, series, ckpt, fixedNowMs = Some(NowMs),
        onBatch = Some(b => if (b.count() > 0) batches.incrementAndGet())))
    q.processAllAvailable()
    q.stop()
    assert(batches.get() === 2) // the bound split the backlog
    assert(spark.read.parquet(samples).count() === 2)
  }

  test("streaming near-dup filter: band collisions reject within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val cfg = graft.streaming.StreamingNearDedup.Config(
      s"$dir/bands", s"$dir/accepted", s"$dir/ckpt")
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the cat watches the bird fly south for winter every year"
    val other = "completely different content about spark streaming joins " +
      "partitions shuffles aggregates windows watermarks and state stores here"
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingNearDedup.start(
      stream.toDS().toDF("doc_id", "text"), cfg)
    // batch 1: base, its exact dup (within-batch), and an unrelated doc
    stream.addData((1L, base), (2L, base), (3L, other))
    q.processAllAvailable()
    // batch 2: another copy of base (vs stored index), a fresh doc, and two
    // docs too short to shingle (<3 tokens → zero band rows) — band-less
    // docs can't collide with anything so they must be ADMITTED, not
    // silently dropped (the at-least-once posture)
    stream.addData((4L, base), (5L, base + " with a tiny suffix change"),
      (6L, "hi"), (7L, "two words"))
    q.processAllAvailable()
    q.stop()
    val accepted = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").as[Long].collect().sorted
    assert(accepted.contains(1L) && accepted.contains(3L), accepted.toSeq)
    assert(!accepted.contains(2L), "within-batch dup must be rejected")
    assert(!accepted.contains(4L), "cross-batch dup must be rejected")
    assert(accepted.contains(6L) && accepted.contains(7L),
      s"short docs must pass through, got ${accepted.toSeq}")
    // band index holds exactly the SHINGLED admitted docs × Bands rows
    // (short docs contribute no band rows)
    val shingled = accepted.filter(id => id != 6L && id != 7L)
    val bands = spark.read.parquet(s"$dir/bands")
    assert(bands.select("doc_id").distinct().count() === shingled.length)
    assert(bands.count() === shingled.length * graft.pipeline.Dedup.Bands)
  }

  test("streaming span dedup: later span occurrences excised within and across batches; batch differential") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-spandedup").toString
    val cfg = graft.streaming.StreamingSpanDedup.Config(
      s"$dir/index", s"$dir/rewritten", s"$dir/ckpt")
    val span = (1 to 16).map(i => s"sp$i").mkString(" ")
    def prefix(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingSpanDedup.start(
      stream.toDS().toDF("doc_id", "text"), cfg)
    // batch 1: first span occurrence (doc 1) + a within-batch repeat
    // (doc 4 — larger id, must lose) + a short doc (no windows → intact)
    stream.addData((1L, prefix("a") + " " + span),
      (4L, prefix("c") + " " + span), (6L, "hi there"))
    q.processAllAvailable()
    // batch 2: cross-batch repeats — embedded (doc 2) and span-only (doc 3)
    stream.addData((2L, prefix("b") + " " + span), (3L, span))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$dir/rewritten").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    rows.values.foreach { case (n, rm, kp, _) => assert(n === rm + kp) }
    assert(rows(1L) === ((36L, 0L, 36L, prefix("a") + " " + span)),
      "first occurrence must survive intact")
    assert(rows(4L) === ((36L, 16L, 20L, prefix("c"))))
    assert(rows(2L) === ((36L, 16L, 20L, prefix("b"))))
    assert(rows(3L) === ((16L, 16L, 0L, "")), "span-only doc rewrites to empty")
    assert(rows(6L) === ((2L, 0L, 2L, "hi there")), "short docs pass through")
    // differential vs the BATCH operator: batch extents over the same
    // corpus = the streamed removals PLUS the first occurrence (batch
    // removal deletes every copy; the stream keeps the first)
    val corpus = Seq((1L, prefix("a") + " " + span), (4L, prefix("c") + " " + span),
      (6L, "hi there"), (2L, prefix("b") + " " + span), (3L, span))
      .toDF("doc_id", "text")
    val batchExtents = graft.pipeline.Dedup.dupSpansVar(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamedRemoved = Set((4L, 21L, 36L), (2L, 21L, 36L), (3L, 1L, 16L))
    assert(batchExtents === streamedRemoved + ((1L, 21L, 36L)), batchExtents)
    // the index carries one row per distinct window hash of the originals
    val idx = spark.read.parquet(s"$dir/index").as[Long].collect()
    assert(idx.length === idx.distinct.length)
    // doc1: 21 windows; doc4: 21 (20 shared-position-but-different + 1 S dup
    // shared with doc1); doc2: 21; doc3: 1 (= the shared S window)
    assert(idx.length === 21 + 20 + 20)
  }

  test("streaming span dedup: stored index survives a restart — recovered state still excises") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-spandedup2").toString
    val cfg = graft.streaming.StreamingSpanDedup.Config(
      s"$dir/index", s"$dir/rewritten", s"$dir/ckpt")
    val span = (1 to 16).map(i => s"sp$i").mkString(" ")
    def prefix(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val s1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingSpanDedup.start(
      s1.toDS().toDF("doc_id", "text"), cfg)
    s1.addData((1L, prefix("a") + " " + span))
    q1.processAllAvailable(); q1.stop()
    // restarted pipeline: the recovered window index must excise the span
    // from a new doc, and admit genuinely fresh text intact
    val s2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingSpanDedup.start(
      s2.toDS().toDF("doc_id", "text"),
      cfg.copy(checkpointDir = s"$dir/ckpt2"))
    s2.addData((2L, prefix("d") + " " + span), (3L, prefix("e")))
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(s"$dir/rewritten").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(4)))).toMap
    assert(rows(1L) === ((0L, prefix("a") + " " + span)))
    assert(rows(2L) === ((16L, prefix("d"))), "recovered index must excise")
    assert(rows(3L) === ((0L, prefix("e"))))
  }

  test("streaming span dedup hybrid: SA sweep is a fixed point on intact state and heals state loss exactly") {
    // round-10 verdict item 6: streaming admits via window hashes
    // (candidate-level, at-least-once); the maintenanceSweep SA pass
    // re-adjudicates EXACTLY. Differential pinned here: intact stream
    // state -> sweep removes nothing; lost index state -> sweep equals
    // the batch SA removal over the degraded store.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-spanhybrid").toString
    val cfg = graft.streaming.StreamingSpanDedup.Config(
      s"$dir/index", s"$dir/rewritten", s"$dir/ckpt")
    val span = (1 to 20).map(i => s"hy$i").mkString(" ")
    def prefix(tag: String) = (1 to 18).map(i => s"$tag$i").mkString(" ")
    val s1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingSpanDedup.start(
      s1.toDS().toDF("doc_id", "text"), cfg)
    s1.addData((1L, prefix("a") + " " + span))          // first copy, kept
    q1.processAllAvailable()
    s1.addData((2L, prefix("b") + " " + span),          // cross-batch dup, excised
      (3L, prefix("c")))                                // fresh, kept whole
    q1.processAllAvailable(); q1.stop()
    // the consumer contract: keep the longest kept version per doc_id
    val keepW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("n_kept").desc, col("new_text"))
    val admitted = spark.read.parquet(s"$dir/rewritten")
      .withColumn("rn", row_number().over(keepW))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("new_text").as("text"))
      .filter(col("text") =!= "")
      .localCheckpoint(true)
    // (a) FIXED POINT: intact streaming state left exactly one copy of
    // every span, so the exact SA sweep finds nothing to remove
    val sweep = graft.streaming.StreamingSpanDedup.maintenanceSweep(admitted)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sweep.values.forall(_ == 0L),
      s"sweep must be a no-op on intact stream state: $sweep")
    // (b) STATE LOSS: a second pipeline with a FRESH index admits the
    // span again (doc 4) — the store now holds two copies; the sweep
    // excises the duplicated extent from BOTH (batch semantics), and is
    // definitionally the batch SA removal over the degraded store
    val degraded = admitted.unionByName(
      Seq((4L, prefix("d") + " " + span)).toDF("doc_id", "text"))
      .localCheckpoint(true)
    val healed = graft.streaming.StreamingSpanDedup.maintenanceSweep(degraded)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(4)))).toMap
    assert(healed(1L)._1 === 20L, "first copy loses the span under batch re-adjudication")
    assert(healed(4L)._1 === 20L, "re-admitted copy loses the span")
    assert(healed(3L)._1 === 0L, "unique doc untouched")
    assert(healed(1L)._2 === prefix("a"), "prefix survives the sweep")
    // and the healed store is itself a fixed point (no dup extents left)
    val after = degraded.join(
        Seq((1L, healed(1L)._2), (2L, healed(2L)._2), (3L, healed(3L)._2),
          (4L, healed(4L)._2)).toDF("doc_id", "t2"), Seq("doc_id"))
      .select(col("doc_id"), col("t2").as("text"))
      .filter(col("text") =!= "")
    assert(graft.pipeline.SuffixOps.saDupExtents(
        after.localCheckpoint(true), graft.pipeline.Dedup.SpanLen).count() === 0L,
      "sweep output must contain no duplicated extent")
  }

  test("streaming pack: incremental sequence spans equal the batch pack; ledger survives restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-streampack").toString
    val cfg = graft.streaming.StreamingPack.Config(
      s"$dir/assigned", s"$dir/state", s"$dir/ckpt")
    // ~900-token docs against PackTarget=2048 → straddles are guaranteed
    def body(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      1L -> body("a", 900), 2L -> body("b", 700), 3L -> body("c", 1100),
      4L -> body("d", 950), 5L -> body("e", 40),
      6L -> body("f", 1500), 7L -> body("g", 10))
    val s1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingPack.start(
      s1.toDS().toDF("doc_id", "text"), cfg)
    s1.addData(corpus.take(3).map { case (i, t) => (i, t) }: _*)
    q1.processAllAvailable()
    s1.addData(corpus.slice(3, 5).map { case (i, t) => (i, t) }: _*)
    q1.processAllAvailable()
    q1.stop()
    // restart with a FRESH checkpoint (new run, batch ids begin at 0
    // again): the ledger total must carry over, not reset or collide
    val s2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingPack.start(
      s2.toDS().toDF("doc_id", "text"), cfg.copy(checkpointDir = s"$dir/ckpt2"))
    s2.addData(corpus.drop(5).map { case (i, t) => (i, t) }: _*)
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(s"$dir/assigned").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // differential: batches arrived in doc_id order, so the streamed
    // assignment must equal the batch operator over the same counts
    val ref = TextOps.packSplitOn(
        corpus.toDF("doc_id", "text").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got === ref, "streamed packing diverged from the batch pack")
    // the fixture actually exercises straddles and cross-batch/cross-run
    // continuity (doc 6 starts exactly where run 1 left off)
    assert(got.values.exists(_._4), "no straddle exercised")
    val tokensThrough5 = corpus.take(5).map(_._2.split(" ").length.toLong).sum
    assert(got(6L)._2 === tokensThrough5 / TextOps.PackTarget)
  }

  test("streaming pack: deleted checkpoint at the SAME path mints a new run; ledger mass survives") {
    // round-10 advice: run was UUID(checkpointDir), so delete-checkpoint-
    // keep-ledger at the same path reused the old run id and the in-flight
    // filter excluded the OLD batch 0 together with the new one — token
    // mass silently dropped. The nonce file inside the checkpoint now
    // disambiguates: same path, fresh checkpoint, distinct run.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-streampack-nonce").toString
    val cfg = graft.streaming.StreamingPack.Config(
      s"$dir/assigned", s"$dir/state", s"$dir/ckpt")
    def body(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(1L -> body("a", 900), 2L -> body("b", 1300),
      3L -> body("c", 1100), 4L -> body("d", 700))
    val s1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingPack.start(
      s1.toDS().toDF("doc_id", "text"), cfg)
    s1.addData(corpus.take(2).map { case (i, t) => (i, t) }: _*)
    q1.processAllAvailable(); q1.stop()
    // delete the CHECKPOINT only — ledger and assignments stay
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.delete(p)
    }
    rmTree(java.nio.file.Paths.get(s"$dir/ckpt"))
    val s2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingPack.start(
      s2.toDS().toDF("doc_id", "text"), cfg) // SAME paths throughout
    s2.addData(corpus.drop(2).map { case (i, t) => (i, t) }: _*)
    q2.processAllAvailable(); q2.stop()
    // two distinct runs in the ledger: batch 0 of run 2 did NOT evict
    // batch 0 of run 1 from the stored total
    val runs = spark.read.parquet(s"$dir/state")
      .select("run").distinct().count()
    assert(runs === 2L, "fresh checkpoint at the same path must mint a new run")
    val got = spark.read.parquet(s"$dir/assigned").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val ref = TextOps.packSplitOn(
        corpus.toDF("doc_id", "text").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n")))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got === ref, "run-2 sequence ids shifted: ledger mass dropped or merged")
  }

  test("streaming url dedup: canonical collisions reject within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-urldedup").toString
    val cfg = graft.streaming.StreamingUrlDedup.Config(
      s"$dir/canon", s"$dir/accepted", s"$dir/ckpt")
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingUrlDedup.start(
      stream.toDS().toDF("doc_id", "url"), cfg)
    // batch 1: three VARIANTS of one page (case, www, port, utm, slash)
    // plus a distinct page — first-crawled (smallest id) wins the group
    stream.addData(
      (1L, "https://site.example.com/a"),
      (2L, "HTTPS://WWW.SITE.EXAMPLE.COM/a/"),
      (3L, "http://site.example.com:80/a?utm_source=x"),
      (4L, "https://other.example.com/b"))
    q.processAllAvailable()
    // batch 2: yet another variant of the stored page (must reject), a
    // same-HOST different-path url (must admit — host is not the key),
    // and a real-params url whose params only SORT (distinct canonical)
    stream.addData(
      (5L, "https://site.example.com:443/a#frag"),
      (6L, "https://site.example.com/c"),
      (7L, "https://site.example.com/a?b=2&a=1"))
    q.processAllAvailable()
    q.stop()
    val accepted = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(accepted === Seq(1L, 4L, 6L, 7L), accepted)
    // the stored index carries exactly one row per admitted canonical page
    val canon = spark.read.parquet(s"$dir/canon").as[String].collect().sorted.toSeq
    assert(canon === Seq(
      "https://other.example.com/b",
      "https://site.example.com/a",
      "https://site.example.com/a?a=1&b=2",
      "https://site.example.com/c"), canon)
  }

  test("streaming url dedup: stored index survives a restart — no re-admission after recovery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-urldedup2").toString
    val cfg = graft.streaming.StreamingUrlDedup.Config(
      s"$dir/canon", s"$dir/accepted", s"$dir/ckpt")

    val s1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.StreamingUrlDedup.start(
      s1.toDS().toDF("doc_id", "url"), cfg)
    s1.addData((1L, "https://site.example.com/a"),
               (2L, "https://other.example.com/b"))
    q1.processAllAvailable(); q1.stop()

    // "restarted" crawler: a VARIANT of an admitted page must be
    // rejected by the recovered stored index (the index IS the dedup
    // state across restarts), a fresh page admitted
    val s2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingUrlDedup.start(
      s2.toDS().toDF("doc_id", "url"),
      cfg.copy(checkpointDir = s"$dir/ckpt2"))
    s2.addData((3L, "HTTPS://WWW.SITE.EXAMPLE.COM/a/"),
               (4L, "https://site.example.com/new"))
    q2.processAllAvailable(); q2.stop()

    val accepted = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(accepted === Seq(1L, 2L, 4L), accepted)
    // one index row per admitted canonical page, across both lifetimes
    val canon = spark.read.parquet(s"$dir/canon").as[String].collect().sorted.toSeq
    assert(canon === Seq(
      "https://other.example.com/b",
      "https://site.example.com/a",
      "https://site.example.com/new"), canon)
  }

  test("streaming difference carries per-series state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingTick}
    val in = MemoryStream[Point]
    val q = StreamingTick.difference(in.toDS())
      .writeStream.format("memory").queryName("diffs")
      .outputMode("append").start()
    in.addData(Point("cpu|a", 1000L, 10.0), Point("cpu|a", 2000L, 15.0),
               Point("cpu|b", 1000L, 100.0))
    q.processAllAvailable()
    // second batch: diff vs state carried from batch 1 (15.0 and 100.0)
    in.addData(Point("cpu|a", 3000L, 18.0), Point("cpu|b", 2000L, 90.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("diffs").as[graft.streaming.DiffPoint].collect()
      .map(d => (d.series, d.ts, d.diff)).toSet
    assert(got === Set(
      ("cpu|a", 2000L, 5.0),   // within batch 1
      ("cpu|a", 3000L, 3.0),   // across batches: 18 - 15
      ("cpu|b", 2000L, -10.0)  // across batches: 90 - 100
    ))
  }

  test("deadman alert: fires once when a series goes silent, survivor stays quiet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{DeadmanEvent, Point, StreamingAlert}
    val in = MemoryStream[Point]
    val q = StreamingAlert.deadman(in.toDS(), timeoutMs = 5000L)
      .writeStream.format("memory").queryName("dead")
      .outputMode("append").start()
    // both series report; watermark after the batch = 2000
    in.addData(Point("cpu|a", 1000L, 1.0), Point("cpu|b", 2000L, 1.0))
    q.processAllAvailable()
    // only b keeps reporting; watermark jumps past a's 6000 deadline
    in.addData(Point("cpu|b", 20000L, 1.0))
    q.processAllAvailable()
    // one more batch so the timeout fires against the advanced watermark
    in.addData(Point("cpu|b", 21000L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dead").as[DeadmanEvent].collect().toSet
    assert(got === Set(DeadmanEvent("cpu|a", 1000L, 6000L)), got)
  }

  test("watermarked tumbling windows: close-once emission, too-late points dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingWindow}
    val in = MemoryStream[Point]
    val q = StreamingWindow.windowedMean(in.toDS(), "1 minute", "1 minute")
      .writeStream.format("memory").queryName("wnd")
      .outputMode("append").start()
    // batch 1: two points in window [0:00,1:00) + one at 3:20 that pushes
    // the watermark to 2:20, past the first window's end
    in.addData(Point("s1", 10000L, 10.0), Point("s1", 20000L, 20.0),
               Point("s1", 200000L, 1.0))
    q.processAllAvailable()
    // batch 2: a point at 0:30 is OLDER than the watermark → dropped (it
    // must not reopen or corrupt the closed window); 6:40 advances the
    // watermark past window [3:00,4:00)
    in.addData(Point("s1", 30000L, 999.0), Point("s1", 400000L, 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wnd")
      .select("series", "window_start_ms", "mean", "n")
      .as[(String, Long, Double, Long)].collect().toSet
    // window [0:00,1:00) emitted exactly once, WITHOUT the too-late 999
    assert(got.contains(("s1", 0L, 15.0, 2L)), got)
    // window [3:00,4:00) closed by the batch-2 watermark advance
    assert(got.contains(("s1", 180000L, 1.0, 1L)), got)
    assert(!got.exists(_._3 > 100), s"late point leaked into a window: $got")
  }

  test("continuous query: stored writes surface as watermarked windows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cq").toString
    val e = new graft.api.GraftEngine(spark, root, () => NowMs)
    // window [23:58,23:59): two points, mean 15
    e.write("dbcq",
      """cpu,host=a u=10 1735689510000000000
        |cpu,host=a u=20 1735689520000000000""".stripMargin)
    val q = e.continuousMean("dbcq", "cpu", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("cq").outputMode("append").start()
    q.processAllAvailable()
    // later batches advance the watermark past the first window (watermark
    // updates at batch end; the closed window emits in the following batch)
    e.write("dbcq", "cpu,host=a u=1 1735689900000000000")
    q.processAllAvailable()
    e.write("dbcq", "cpu,host=a u=2 1735689960000000000")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cq").select("window_start_ms", "mean", "n")
      .as[(Long, Double, Long)].collect().toSet
    assert(got.contains((1735689480000L, 15.0, 2L)), got)
  }

  test("restart resumes from checkpoint without re-registering series") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream2").toString
    val cfg = StreamingIngest.Config(
      s"$dir/samples", s"$dir/series", s"$dir/ckpt", fixedNowMs = Some(NowMs))

    val s1 = MemoryStream[String]
    val q1 = StreamingIngest.start(s1.toDS(), cfg)
    s1.addData("mem,host=a used=10 1735689600000000000")
    q1.processAllAvailable(); q1.stop()

    // "restarted" stream, same series again + a new one
    val s2 = MemoryStream[String]
    val q2 = StreamingIngest.start(s2.toDS(), cfg.copy(checkpointDir = s"$dir/ckpt2"))
    s2.addData("mem,host=a used=11 1735689660000000000",
               "mem,host=b used=12 1735689660000000000")
    q2.processAllAvailable(); q2.stop()

    val idx = spark.read.parquet(s"$dir/series")
    // host=a registered once (stored index IS the dedup state across restarts)
    assert(idx.count() === 2)
    assert(spark.read.parquet(s"$dir/samples").count() === 3)
  }

  test("streaming session windows: inactivity gap splits sessions, append emits closed ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingWindow}
    val in = MemoryStream[Point]
    val q = StreamingWindow.sessionized(in.toDS(), gap = "30 seconds", lateness = "10 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // session 1: points at 0:00 and 0:10 (within the 30 s gap);
    // then silence until 2:00 → a second session; the 2:00 point also
    // pushes the watermark past session 1's close
    in.addData(Point("s1", 0L, 10.0), Point("s1", 10000L, 20.0), Point("s1", 120000L, 5.0))
    q.processAllAvailable()
    // advance the watermark far past everything so session 2 closes too
    in.addData(Point("wm", 600000L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess")
      .select("series", "session_start_ms", "session_end_ms", "n", "mean")
      .as[(String, Long, Long, Long, Double)].collect()
      .filter(_._1 == "s1").toSet
    // session 1 = [0, 10s + 30s gap), 2 points, mean 15; session 2 = single point
    assert(got === Set(
      ("s1", 0L, 40000L, 2L, 15.0),
      ("s1", 120000L, 150000L, 1L, 5.0)), got)
  }

  test("streaming threshold alert: one event per crossing, state survives batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingAlert}
    val in = MemoryStream[Point]
    val q = StreamingAlert.threshold(in.toDS(), 50.0)
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    // batch 1: 10 → 60 (crit at ts 2) → 70 (still above: silent)
    in.addData(Point("s1", 1L, 10.0), Point("s1", 2L, 60.0), Point("s1", 3L, 70.0))
    q.processAllAvailable()
    // batch 2: state carries "above" across batches → 40 emits ok; then
    // 90 re-crosses (crit); another series' first point above → crit
    in.addData(Point("s1", 4L, 40.0), Point("s1", 5L, 90.0), Point("s2", 1L, 99.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("alerts")
      .as[graft.streaming.AlertEvent].collect()
      .map(a => (a.series, a.ts, a.level)).toSet
    assert(got === Set(
      ("s1", 2L, "crit"), ("s1", 4L, "ok"), ("s1", 5L, "crit"), ("s2", 1L, "crit")), got)
  }

  test("streaming drift alert: silent warmup, one transition per shift, absorbs and re-arms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingAlert}
    val in = MemoryStream[Point]
    val q = StreamingAlert.drift(in.toDS(), zMax = 4.0, warmup = 20)
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    // batch 1: 24 warmup points oscillating 10 ± 0.5 → no events
    in.addData((1 to 24).map(i => Point("s1", i.toLong, if (i % 2 == 0) 10.5 else 9.5)): _*)
    q.processAllAvailable()
    assert(spark.table("drift").count() === 0)
    // batch 2 (state carries): level shifts to 100 and STAYS there; the
    // first shifted point breaches, then the baseline absorbs the new
    // level and the detector re-arms with one ok — exactly 2 events.
    // A stable series never alerts.
    in.addData((25 to 60).map(i => Point("s1", i.toLong, 100.0)) ++
      (1 to 40).map(i => Point("s2", i.toLong, 5.0)): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drift").as[StreamingAlert.DriftEvent].collect()
      .sortBy(_.ts).map(e => (e.series, e.ts, e.level))
    assert(got.head === (("s1", 25L, "high")), got.toSeq)
    assert(got.count(_._3 == "high") === 1, got.toSeq)
    assert(got.count(_._3 == "ok") === 1, got.toSeq)
    assert(got.forall(_._1 == "s1"), got.toSeq)
  }

  test("streaming window funnel: differential parity with the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{FunnelEvent, StreamingFunnel}
    import graft.pipeline.EventOps
    val events = graft.sources.EventsAdapter.events(spark, "/root/testdata/sf0.001")
    val rows = events
      .selectExpr("user_id", "event_type", "ts_ns div 1000000 AS ts_ms")
      .as[(Long, String, Long)].collect()
      .map(t => FunnelEvent(t._1, t._2, t._3)).sortBy(e => (e.ts_ms, e.event_type))
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.funnel(in.toDS(), EventOps.FunnelWindowMs)
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    // two in-order batches so cross-batch frontier state is exercised
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sfunnel").as[graft.streaming.FunnelLevel].collect()
      .groupBy(_.user_id).view.mapValues(_.map(_.level).max).toMap
    val streamHist = streamed.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batchHist = EventOps.windowFunnel(events).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(streamHist === batchHist, s"stream=$streamHist batch=$batchHist")
    // transitions emit once per (user, level)
    val t = spark.table("sfunnel").as[graft.streaming.FunnelLevel].collect()
    assert(t.groupBy(e => (e.user_id, e.level)).values.forall(_.length == 1))
  }

  test("streaming funnel: frontier state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{FunnelEvent, StreamingFunnel}
    val dir = Files.createTempDirectory("graft-funnel").toString
    val h = 3600000L
    val in = MemoryStream[FunnelEvent]
    def start() = StreamingFunnel.funnel(in.toDS(), 3L * 86400000L)
      .writeStream.format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    // run 1: chain reaches level 2, then the query dies
    val q1 = start()
    in.addData(FunnelEvent(1L, "signup", 0L), FunnelEvent(1L, "view", h))
    q1.processAllAvailable(); q1.stop()
    // run 2, same checkpoint: the click/purchase can only complete the
    // chain if the (start, reach) frontier was recovered from state
    val q2 = start()
    in.addData(FunnelEvent(1L, "click", 2 * h), FunnelEvent(1L, "purchase", 3 * h))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(s"$dir/out")
      .as[graft.streaming.FunnelLevel].collect().sortBy(_.level)
      .map(e => (e.level, e.ts_ms))
    assert(got.toSeq === Seq((1, 0L), (2, h), (3, 2 * h), (4, 3 * h)))
  }

  test("stream-stream interval join: pairs within the bound, state evicted by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingJoin}
    val cause = MemoryStream[Point]
    val effect = MemoryStream[Point]
    val q = StreamingJoin.causeEffect(cause.toDS(), effect.toDS(),
        withinMs = 60000L, lateness = "10 seconds")
      .writeStream.format("memory").queryName("ce").outputMode("append").start()
    // click at 0:10 → purchase at 0:40 (within 60 s): pairs.
    // purchase at 2:00 (beyond the minute after the click): no pair.
    // different series at 0:30: no pair.
    cause.addData(Point("u1", 10000L, 1.0))
    effect.addData(Point("u1", 40000L, 5.0), Point("u2", 30000L, 7.0),
      Point("u1", 120000L, 9.0))
    q.processAllAvailable()
    // advance both watermarks far past everything so pending pairs emit
    cause.addData(Point("wm", 600000L, 0.0))
    effect.addData(Point("wm", 600000L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ce")
      .select("series", "cause_ts", "effect_ts", "effect_value")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(("u1", 10000L, 40000L, 5.0)), got)
  }

  test("stream-static enrichment: broadcast dim decorates points, unmatched pass through") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingJoin}
    val in = MemoryStream[Point]
    val dim = Seq(("cpu|a", "dc1", "m5"), ("cpu|b", "dc2", "m6"))
      .toDF("series", "dc", "machine")
    val q = StreamingJoin.enrich(in.toDS(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(Point("cpu|a", 1000L, 1.0), Point("cpu|z", 2000L, 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched")
      .select("series", "dc", "machine").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(got === Set(
      ("cpu|a", Some("dc1"), Some("m5")),
      ("cpu|z", None, None))) // registry lag must not drop telemetry
  }

  test("streaming windowed HLL: close-once estimate, exact in the sparse regime") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingSketch, WindowDistinct}
    val in = MemoryStream[Point]
    val q = StreamingSketch.windowedDistinct(in.toDS(), 60000L, 1000L)
      .writeStream.format("memory").queryName("whll")
      .outputMode("append").start()
    // window [0, 60s): three distinct series, one repeated
    in.addData(Point("cpu|a", 1000L, 1.0), Point("cpu|b", 2000L, 1.0),
               Point("cpu|c", 3000L, 1.0), Point("cpu|a", 4000L, 1.0))
    q.processAllAvailable()
    // advance the watermark far past the window end → window closes once
    in.addData(Point("cpu|z", 300000L, 1.0))
    q.processAllAvailable()
    in.addData(Point("cpu|z", 400000L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("whll").as[WindowDistinct].collect()
      .filter(_.windowStart == 0L)
    // linear counting is exact while registers are sparse: 3 distinct
    assert(got.toSeq === Seq(WindowDistinct(0L, 3L)), got.toSeq)
  }

  test("streaming windowed quantiles: order-insensitive, one-bin-width bound, close-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingSketch, WindowQuantiles}
    val in = MemoryStream[Point]
    // domain [0, 64) with 64 bins → bin width 1.0, quantile = ceil(v)+edge
    // 10 s lateness: the second batch is intentionally out-of-order
    // behind the first batch's max event time
    val q = StreamingSketch.windowedQuantiles(in.toDS(), 60000L, 10000L, 0.0, 64.0)
      .writeStream.format("memory").queryName("wq")
      .outputMode("append").start()
    // window [0, 60s): values 1..10, delivered out of order across batches
    in.addData(Point("s", 5000L, 7.0), Point("s", 1000L, 1.0),
               Point("s", 4000L, 10.0), Point("s", 2000L, 3.0), Point("s", 3000L, 5.0))
    q.processAllAvailable()
    in.addData(Point("s", 1500L, 2.0), Point("s", 2500L, 4.0),
               Point("s", 3500L, 6.0), Point("s", 4500L, 8.0), Point("s", 5500L, 9.0))
    q.processAllAvailable()
    // advance the watermark far past the window end → close once
    in.addData(Point("s", 300000L, 1.0))
    q.processAllAvailable()
    in.addData(Point("s", 400000L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wq").as[WindowQuantiles].collect()
      .filter(_.windowStart == 0L)
    assert(got.length === 1, got.toSeq)
    val r = got.head
    assert(r.n === 10L)
    // values 1..10, width-1 bins: value v lands in bin floor(v) with upper
    // edge floor(v)+1; rank ceil(.5*10)=5 → value 5 → 6.0, rank 9 → 9 →
    // 10.0, rank ceil(.99*10)=10 → 10 → 11.0
    assert(r.p50 === 6.0 && r.p90 === 10.0 && r.p99 === 11.0, r)
    // one-bin-width bound vs the true order statistics (5, 9, 10)
    assert(r.p50 - 5.0 <= 1.0 && r.p90 - 9.0 <= 1.0 && r.p99 - 10.0 <= 1.0)
  }

  test("streaming heavy hitters: bounds hold, heavy series guaranteed, close-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Point, StreamingSketch, WindowHeavyHitter}
    val in = MemoryStream[Point]
    val q = StreamingSketch.windowedHeavyHitters(in.toDS(), 60000L, 1000L, 3L)
      .writeStream.format("memory").queryName("whh")
      .outputMode("append").start()
    // window [0, 60s): "hot" appears 5x across two batches, others once
    in.addData(Point("hot", 1000L, 1.0), Point("hot", 2000L, 1.0),
               Point("cold1", 3000L, 1.0), Point("hot", 4000L, 1.0))
    q.processAllAvailable()
    in.addData(Point("hot", 5000L, 1.0), Point("hot", 6000L, 1.0),
               Point("cold2", 7000L, 1.0))
    q.processAllAvailable()
    // advance the watermark past the window end → close once
    in.addData(Point("z", 300000L, 1.0))
    q.processAllAvailable()
    in.addData(Point("z", 400000L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("whh").as[WindowHeavyHitter].collect()
      .filter(_.windowStart == 0L)
    // capacity 64 >> 4 distinct series: counts are exact, errors zero
    assert(got.toSeq === Seq(WindowHeavyHitter(0L, "hot", 5L, 0L)), got.toSeq)
  }

  test("streaming exact dedup: first content wins within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{StreamDoc, StreamingDedup}
    val in = MemoryStream[StreamDoc]
    val q = StreamingDedup.firstSeen(in.toDS())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    // batch 1: docs 1 and 3 share content — smallest docId survives
    in.addData(StreamDoc(3, "alpha beta"), StreamDoc(1, "alpha beta"),
               StreamDoc(2, "gamma"))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate is dropped by carried state;
    // fresh content passes
    in.addData(StreamDoc(4, "alpha beta"), StreamDoc(5, "delta"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup").as[StreamDoc].collect().map(_.docId).toSet
    assert(got === Set(1L, 2L, 5L), got)
  }

  test("streaming-ingested store answers the fuzz grammar like the adapter path") {
    // the composition test: events → line protocol → micro-batched
    // StreamingIngest → hour-partitioned store → Planner must equal the
    // adapter-catalog path for a stride sample of the differential-fuzz
    // space. Restricted to order-insensitive families (count/min/max/
    // spread/first/last/median/percentile/top/bottom + SHOW): sum/mean
    // over the partitioned store may shift one fixed-point ulp because
    // the accumulation order changes (same bound the store-mode fuzz
    // sweep documents in tools/check_oracle.py --tol1).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-stream-diff").toString
    val (samples, series, ckpt) = (s"$dir/samples", s"$dir/series", s"$dir/ckpt")
    val lines = graft.sources.EventsAdapter.asLineProtocol(
      graft.sources.EventsAdapter.events(spark, sfDir)).as[String].collect().toSeq

    val stream = MemoryStream[String]
    val q = StreamingIngest.start(stream.toDS(), StreamingIngest.Config(
      samples, series, ckpt, fixedNowMs = Some(NowMs)))
    // three micro-batches, last chunk delivered first (T3: order-free)
    val chunks = lines.grouped((lines.size + 2) / 3).toSeq
    (chunks.last +: chunks.init).foreach { c => stream.addData(c); q.processAllAvailable() }
    q.stop()

    val streamCat = graft.query.TsCatalog(Seq("graft"),
      Map(graft.sources.EventsAdapter.Measurement ->
        spark.read.parquet(samples)
          .filter(col("measurement") === graft.sources.EventsAdapter.Measurement)),
      graft.ingest.Ingest.readSeriesIndexFinal(spark, series))
    val batchCat = graft.sources.EventsAdapter.catalog(spark, sfDir)

    val exactFns = Set("count", "min", "max", "spread", "first", "last",
      "median", "percentile", "top", "bottom")
    val eligible = graft.tools.Fuzz.allCases.filter(c =>
      exactFns.exists(p => c.name.startsWith(s"fuzz_${p}")) || c.name.endsWith("_show"))
    val sample = eligible.indices.filter(_ % 29 == 0).map(eligible)
    assert(sample.size >= 20, s"sample too small: ${sample.size}")
    sample.foreach { c =>
      val a = graft.tools.Fuzz.run(spark, streamCat, c).collect().toSeq
      val b = graft.tools.Fuzz.run(spark, batchCat, c).collect().toSeq
      assert(a == b, s"${c.name}: streaming-store result diverges from adapter")
    }
  }

  test("streaming media gate: batch-trained profile scores the stream; differential + fail-closed + restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mediagate").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // model trained OFFLINE on the reference corpus, shipped as a constant
    val profile = graft.streaming.StreamingMediaGate.trainProfile(docs)
    assert(profile.keySet === graft.pipeline.Multimodal.ImgClassNames.toSet)
    val cfg = graft.streaming.StreamingMediaGate.Config(
      s"$dir/verdicts", s"$dir/ckpt", dropClasses = Set("inv"))
    // stream payloads from the SAME derivation the batch operator scores
    val corpus = graft.pipeline.Multimodal.imageClassCorpus(docs)
      .select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().sortBy(_._1).take(40)
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingMediaGate.start(
      stream.toDS().toDF("media_id", "payload"), profile, cfg)
    val (b1, b2) = corpus.splitAt(20)
    stream.addData(b1.toSeq)
    q.processAllAvailable()
    // batch 2 includes a corrupt payload: the gate must fail CLOSED
    stream.addData(b2.toSeq :+ (999999L, Array[Byte](1, 2, 3)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$dir/verdicts")
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // differential: streamed class_pred == the batch operator's, row by row
    val batchPred = graft.pipeline.Multimodal.imageClassify(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    corpus.foreach { case (id, _) =>
      val (cls, score) = batchPred(id)
      assert(got(id)._2 === cls, s"media $id: stream pred drifts from batch")
      assert(got(id)._3 === score, s"media $id: stream score drifts from batch")
      assert(got(id)._4 === (cls != "inv"), s"media $id: kept flag")
    }
    assert(got(999999L)._2 === "unk" && !got(999999L)._4,
      "corrupt payload must predict unk and be dropped (fail closed)")
    // restart from the same checkpoint: replay-new-data only, verdicts
    // for a third batch land after restart (the at-least-once posture)
    val q2 = graft.streaming.StreamingMediaGate.start(
      stream.toDS().toDF("media_id", "payload"), profile, cfg)
    val extra = graft.pipeline.Multimodal.imageClassCorpus(docs)
      .select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().sortBy(_._1).slice(40, 45)
    stream.addData(extra.toSeq)
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(s"$dir/verdicts")
      .as[(Long, String, Long, Boolean)].collect().map(_._1).toSet
    extra.foreach { case (id, _) => assert(after.contains(id), s"post-restart media $id") }
  }

  test("streaming extract gate: stream verdicts match batch; chrome-only fails closed; restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-extractgate").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cfg = graft.streaming.StreamingExtract.Config(
      s"$dir/verdicts", s"$dir/ckpt", minKeptWords = 1L)
    // pages from the SAME plant the batch entry extracts
    val pages = graft.pipeline.Extract.plantHtml(docs)
      .select("doc_id", "html").as[(Long, String)].collect().sortBy(_._1).take(40)
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingExtract.start(
      stream.toDS().toDF("doc_id", "html"), cfg)
    val (b1, b2) = pages.splitAt(20)
    stream.addData(b1.toSeq)
    q.processAllAvailable()
    // batch 2 includes a chrome-only page: all links, zero prose words
    val chromeOnly =
      s"${graft.pipeline.Extract.Nav}\n${graft.pipeline.Extract.Footer}"
    stream.addData(b2.toSeq :+ (999999L, chromeOnly))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$dir/verdicts")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // differential: every streamed verdict equals the batch operator's
    val batchRows = graft.pipeline.Extract.htmlExtract(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    pages.foreach { case (id, _) =>
      val (nb, nk, kw, h) = batchRows(id)
      val s = got(id)
      assert((s._2, s._3, s._4, s._5) === ((nb, nk, kw, h)),
        s"page $id: stream verdict drifts from batch")
      assert(s._6, s"page $id wrongly dropped")
    }
    assert(got(999999L)._4 === 0L && !got(999999L)._6,
      "chrome-only page must extract zero words and be dropped (fail closed)")
    // restart from the same checkpoint: a third batch lands after restart
    val q2 = graft.streaming.StreamingExtract.start(
      stream.toDS().toDF("doc_id", "html"), cfg)
    val extra = graft.pipeline.Extract.plantHtml(docs)
      .select("doc_id", "html").as[(Long, String)].collect().sortBy(_._1).slice(40, 45)
    stream.addData(extra.toSeq)
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(s"$dir/verdicts")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().map(_._1).toSet
    extra.foreach { case (id, _) => assert(after.contains(id), s"post-restart page $id") }
  }
}
