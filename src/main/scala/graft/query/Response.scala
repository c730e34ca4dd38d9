package graft.query

import org.apache.spark.sql.{DataFrame, Row}
import scala.collection.mutable

/** Rows → InfluxDB-compatible JSON response shapes.
  *
  * Reproduces the reference's pivot at cflux.js:793-832: one series per
  * (metric, tagKey, tagValue), columns ["time", metric], values
  * [[ts_ms, v], ...] — with one independent object per group (fixing the
  * reference's object-aliasing pivot bug noted in SURVEY §3.2).
  */
object Response {

  final case class Series(name: String, tags: Map[String, String],
                          columns: Seq[String], values: Seq[Seq[Any]])

  /** Pivot the planner's SELECT output (time_ms, name, value, labelname,
    * labelvalue, message). Call only at the API boundary, on a result that
    * is already bounded (honored LIMIT / aggregated) — never mid-plan. A
    * single JSON document necessarily holds its whole result; unbounded
    * raw SELECTs belong on the chunked path ([[selectEntryStream]]), which
    * streams via toLocalIterator instead of collecting.
    *
    * Shape per cflux.js:815-832: series name = the MEASUREMENT, columns
    * ["time", metric], one series per (metric, tagKey, tagValue) — each an
    * independent object (the reference pushes one mutated object, the
    * aliasing bug flagged in SURVEY §3.2). */
  def pivotSelect(df: DataFrame, measurement: String,
                  timeScale: Long => Long = identity): Seq[(String, Series)] = {
    val rows = df.collect()
    val order = mutable.LinkedHashMap.empty[(String, String, String), mutable.ArrayBuffer[Seq[Any]]]
    rows.foreach { r =>
      val name = r.getAs[String]("name")
      val key = (name, r.getAs[String]("labelname"), r.getAs[String]("labelvalue"))
      val msg = r.getAs[String]("message")
      // FILL(null) gap rows carry a NULL value — surface them as JSON null
      // (getAs[Double] would unbox to 0.0, conflating FILL(null) with FILL(0))
      val v: Any =
        if (msg != null && msg.nonEmpty) msg
        else if (r.isNullAt(r.fieldIndex("value"))) null
        else r.getAs[Double]("value")
      order.getOrElseUpdate(key, mutable.ArrayBuffer.empty) +=
        Seq(timeScale(r.getAs[Long]("time_ms")), v)
    }
    order.toSeq.map { case ((metric, lk, lv), vals) =>
      metric -> Series(measurement, Map(lk -> lv), Seq("time", metric), vals.toSeq)
    }
  }

  /** One results[] entry per (metric, tag pair), statement_id = the
    * metric's first-seen index (cflux.js:818-829). */
  def selectJson(df: DataFrame, measurement: String): String =
    multiSelectJson(Seq(measurement -> df))

  /** Regex-FROM variant: each matched measurement pivots under its own
    * series name (InfluxDB names each series after its measurement),
    * concatenated into one results[] list with shared statement ids. */
  def multiSelectJson(per: Seq[(String, DataFrame)]): String =
    s"""{"results":${selectEntries(per, 0, perMetricIds = true).mkString("[", ",", "]")}}"""

  /** results[] entries for a SELECT. perMetricIds = the reference's quirk
    * (one entry per metric, ids by first-seen metric — single-statement
    * compat); otherwise one entry carrying every series under `baseId`
    * (InfluxDB's shape for multi-statement queries). */
  def selectEntries(per: Seq[(String, DataFrame)], baseId: Int,
                    perMetricIds: Boolean,
                    timeScale: Long => Long = identity,
                    chunkSize: Option[Int] = None): Seq[String] = {
    val pivoted = per.flatMap { case (m, df) => pivotSelect(df, m, timeScale) }
    // chunk_size splitting (InfluxDB chunked responses): a series longer
    // than N points spans several chunks. "partial":true at SERIES level on
    // every chunk of that series but its last; at STATEMENT level on every
    // chunk of the statement but the statement's FINAL chunk — the last
    // chunk of a non-final series still carries the statement flag, because
    // more chunks of the statement follow (InfluxDB's flags).
    def seriesChunks(s: Series): Seq[String] = chunkSize match {
      case Some(n) if n > 0 && s.values.size > n =>
        val groups = s.values.grouped(n).toSeq
        groups.zipWithIndex.map { case (vs, gi) =>
          seriesJson(s.copy(values = vs), partial = gi < groups.size - 1)
        }
      case _ => Seq(seriesJson(s))
    }
    def statementEntries(id: Int, ss: Seq[Series]): Seq[String] = {
      val chunks = ss.flatMap(seriesChunks)
      chunks.zipWithIndex.map { case (sj, i) =>
        if (i < chunks.size - 1) s"""{"statement_id":$id,"series":[$sj],"partial":true}"""
        else s"""{"statement_id":$id,"series":[$sj]}"""
      }
    }
    if (perMetricIds) {
      val metricIdx = mutable.LinkedHashMap.empty[String, Int]
      pivoted.foreach { case (m, _) => metricIdx.getOrElseUpdate(m, metricIdx.size) }
      if (chunkSize.exists(n => n > 0 && pivoted.exists(_._2.values.size > n))) {
        // group series by statement id (first-seen metric order) so the
        // statement-level flag spans all of a statement's series
        val byId = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Series]]
        pivoted.foreach { case (m, s) =>
          byId.getOrElseUpdate(metricIdx(m), mutable.ArrayBuffer.empty) += s
        }
        byId.toSeq.flatMap { case (id, ss) => statementEntries(id, ss.toSeq) }
      } else
        // unchunked reference quirk: one entry per (metric, series) pair
        pivoted.map { case (m, s) =>
          s"""{"statement_id":${metricIdx(m)},"series":[${seriesJson(s)}]}"""
        }
    } else if (chunkSize.exists(n => n > 0 && pivoted.exists(_._2.values.size > n))) {
      statementEntries(baseId, pivoted.map(_._2))
    } else Seq(entryJson(baseId, pivoted.map(_._2)))
  }

  /** InfluxDB's default chunk size when `chunked=true` arrives without an
    * explicit `chunk_size`. */
  val DefaultChunkSize = 10000

  /** Streaming form of [[selectEntries]] for chunked responses: rows are
    * pulled through `toLocalIterator` (one partition resident at a time,
    * never a full `collect()`), accumulated into per-series buffers of at
    * most `chunkSize` points, and emitted as complete results documents as
    * they fill. Driver memory is bounded by (open series × chunkSize)
    * points plus one held-back chunk per statement — independent of total
    * result size, so a raw un-LIMITed SELECT streams instead of buffering
    * (the reference's row streaming, cflux.js:792-810).
    *
    * Flag semantics match [[selectEntries]]: series-level "partial" on a
    * chunk iff more points of THAT series follow (a full buffer is only
    * emitted when its overflow point arrives, so the flag is never a
    * guess); statement-level "partial" on every chunk but the statement's
    * final one (one-chunk hold-back per statement id). Chunks of different
    * series interleave in row order — protocol-legal, and the price of not
    * buffering the result. */
  def selectEntryStream(per: Seq[(String, DataFrame)], baseId: Int,
                        perMetricIds: Boolean,
                        timeScale: Long => Long = identity,
                        chunkSize: Int = DefaultChunkSize): Iterator[String] =
    new Iterator[String] {
      import scala.jdk.CollectionConverters._
      private val rows: Iterator[(String, Row)] = per.iterator.flatMap {
        case (m, df) => df.toLocalIterator().asScala.map(r => (m, r))
      }
      private val metricIdx = mutable.LinkedHashMap.empty[String, Int]
      // key: (measurement, metric, labelKey, labelValue); insertion-ordered
      // so the end-of-stream flush preserves first-seen series order
      private val buffers =
        mutable.LinkedHashMap.empty[(String, String, String, String), mutable.ArrayBuffer[Seq[Any]]]
      private val held = mutable.LinkedHashMap.empty[Int, String]
      private val ready = mutable.Queue.empty[String]
      private var flushed = false

      private def stmtId(metric: String): Int =
        if (perMetricIds) metricIdx.getOrElseUpdate(metric, metricIdx.size) else baseId

      private def pushChunk(id: Int, sj: String): Unit = {
        held.remove(id).foreach { prev =>
          ready += s"""{"statement_id":$id,"series":[$prev],"partial":true}"""
        }
        held(id) = sj
      }

      private def advance(): Unit = {
        while (ready.isEmpty && rows.hasNext) {
          val (meas, r) = rows.next()
          val name = r.getAs[String]("name")
          val key = (meas, name, r.getAs[String]("labelname"), r.getAs[String]("labelvalue"))
          val msg = r.getAs[String]("message")
          val v: Any =
            if (msg != null && msg.nonEmpty) msg
            else if (r.isNullAt(r.fieldIndex("value"))) null
            else r.getAs[Double]("value")
          val buf = buffers.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
          if (buf.size >= chunkSize) {
            // overflow point arrived → the buffered chunk is provably partial
            pushChunk(stmtId(name), seriesJson(
              Series(meas, Map(key._3 -> key._4), Seq("time", name), buf.toSeq),
              partial = true))
            buf.clear()
          }
          buf += Seq(timeScale(r.getAs[Long]("time_ms")), v)
        }
        if (ready.isEmpty && !rows.hasNext && !flushed) {
          flushed = true
          buffers.iterator.filter(_._2.nonEmpty).foreach {
            case ((meas, name, lk, lv), buf) =>
              pushChunk(stmtId(name),
                seriesJson(Series(meas, Map(lk -> lv), Seq("time", name), buf.toSeq)))
          }
          held.foreach { case (id, sj) =>
            ready += s"""{"statement_id":$id,"series":[$sj]}"""
          }
          held.clear()
        }
      }

      override def hasNext: Boolean = { advance(); ready.nonEmpty }
      override def next(): String = { advance(); ready.dequeue() }
    }

  /** One results[] entry: bare statement id when there are no series. */
  def entryJson(id: Int, series: Seq[Series]): String =
    if (series.isEmpty) s"""{"statement_id":$id}"""
    else s"""{"statement_id":$id,"series":[${series.map(seriesJson(_)).mkString(",")}]}"""

  /** SHOW-shaped DataFrame → one Series (columns + collected rows). */
  def showSeries(seriesName: String, df: DataFrame): Series = {
    val cols = df.columns.toSeq
    val values = df.collect().toSeq.map(r => (0 until r.length).map(r.get))
    Series(seriesName, Map.empty, cols, values)
  }

  /** SHOW MEASUREMENTS / FIELD KEYS / TAG KEYS / TAG VALUES / DATABASES —
    * the generic single-series shapes of cflux.js:450-674. */
  def showJson(seriesName: String, df: DataFrame): String =
    resultsJson(Seq(showSeries(seriesName, df)))

  def emptyResult: String = """{"results":[{"statement_id":0}]}"""

  private def seriesJson(s: Series, partial: Boolean = false): String = {
    // empty name → nameless series (retention policies, cflux.js:425-444)
    val name = if (s.name.isEmpty) "" else s""""name":${q(s.name)},"""
    val tags =
      if (s.tags.isEmpty) ""
      else s.tags.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString(""""tags":{""", ",", "},")
    val cols = s.columns.map(q).mkString("[", ",", "]")
    val vals = s.values.map(_.map(jval).mkString("[", ",", "]")).mkString("[", ",", "]")
    val part = if (partial) ""","partial":true""" else ""
    s"""{$name$tags"columns":$cols,"values":$vals$part}"""
  }

  def resultsJson(series: Seq[Series]): String = {
    val ss = series.map(seriesJson(_)).mkString("[", ",", "]")
    s"""{"results":[{"statement_id":0,"series":$ss}]}"""
  }

  private def jval(a: Any): String = a match {
    case null                => "null"
    case s: String           => q(s)
    case xs: Seq[_]          => xs.map(jval).mkString("[", ",", "]")
    case b: Boolean          => b.toString
    case d: Double           => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case n: Number           => n.toString
    case other               => q(other.toString)
  }

  /** Escape a string for embedding in a JSON string literal (quotes,
    * backslash, and all control chars < 0x20). Shared by every hand-built
    * JSON emitter — parser error messages embed raw token payloads, which
    * may contain newlines/tabs that would otherwise break the response. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""
}
