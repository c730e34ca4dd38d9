package graft.ingest

/** InfluxDB line-protocol parser (pure Scala).
  *
  * Format (public spec; consumed by the reference via
  * `@qxip/influx-line-protocol-parser` at /root/reference/lineparser.js:1-47):
  *
  *   measurement[,tagK=tagV...] fieldK=fieldV[,fieldK=fieldV...] [ts-ns]
  *
  * Escapes: `\,` `\ ` in measurement; `\,` `\=` `\ ` in tag/field keys and
  * tag values; string field values are double-quoted with `\"` and `\\`.
  * Field value types: float, integer (`i` suffix), unsigned (`u` suffix),
  * boolean (t/T/true/True/TRUE, f/F/false/False/FALSE), string.
  *
  * Type policy (SURVEY §1.2): the engine stores Float64 or String per field.
  * Numerics (float/int/uint) land in the float pipeline — including value
  * `0`, an intentional divergence from the reference's
  * `if (!parseFloat(v))` bug at cflux.js:362-366. Booleans and strings land
  * in the string pipeline (matching the reference, where parseFloat of a
  * boolean is NaN).
  */
object LineProtocol {

  sealed trait FieldValue
  final case class FloatV(v: Double) extends FieldValue
  final case class StringV(v: String) extends FieldValue

  final case class Point(
      measurement: String,
      tags: Seq[(String, String)],
      fields: Seq[(String, FieldValue)],
      timestampNs: Option[Long]
  )

  final case class ParseError(line: String, reason: String)

  /** Parse one line. Returns Left on malformed input (never throws). */
  def parse(line: String): Either[ParseError, Point] = {
    val s = line
    val n = s.length
    var i = 0
    def err(reason: String) = Left(ParseError(line, reason))

    // -- measurement + tags section (terminated by unescaped ' ')
    def readIdent(terminators: Set[Char]): String = {
      val sb = new StringBuilder
      while (i < n && !terminators.contains(s.charAt(i))) {
        if (s.charAt(i) == '\\' && i + 1 < n) {
          val c = s.charAt(i + 1)
          if (c == ',' || c == ' ' || c == '=' || c == '\\') { sb += c; i += 2 }
          else { sb += '\\'; i += 1 }
        } else { sb += s.charAt(i); i += 1 }
      }
      sb.result()
    }

    while (i < n && s.charAt(i) == ' ') i += 1
    if (i >= n || s.charAt(i) == '#') return err("empty or comment")

    val measurement = readIdent(Set(',', ' '))
    if (measurement.isEmpty) return err("empty measurement")

    val tags = Seq.newBuilder[(String, String)]
    while (i < n && s.charAt(i) == ',') {
      i += 1
      val k = readIdent(Set('=', ',', ' '))
      if (i >= n || s.charAt(i) != '=') return err(s"tag '$k' missing '='")
      i += 1
      val v = readIdent(Set('=', ',', ' '))
      if (k.isEmpty) return err("empty tag key")
      tags += ((k, v))
    }
    if (i >= n || s.charAt(i) != ' ') return err("missing fields section")
    while (i < n && s.charAt(i) == ' ') i += 1

    // -- fields section
    val fields = Seq.newBuilder[(String, FieldValue)]
    var more = true
    while (more) {
      val k = readIdent(Set('=', ',', ' '))
      if (k.isEmpty) return err("empty field key")
      if (i >= n || s.charAt(i) != '=') return err(s"field '$k' missing '='")
      i += 1
      if (i < n && s.charAt(i) == '"') { // quoted string value
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < n && (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) {
            sb += s.charAt(i + 1); i += 2
          } else if (c == '"') { closed = true; i += 1 }
          else { sb += c; i += 1 }
        }
        if (!closed) return err("unterminated string value")
        fields += ((k, StringV(sb.result())))
      } else {
        val raw = readIdent(Set(',', ' '))
        if (raw.isEmpty) return err(s"field '$k' empty value")
        parseFieldValue(raw) match {
          case Some(fv) => fields += ((k, fv))
          case None     => return err(s"field '$k' bad value '$raw'")
        }
      }
      if (i < n && s.charAt(i) == ',') { i += 1 } else more = false
    }

    // -- optional timestamp (ns)
    var tsNs: Option[Long] = None
    while (i < n && s.charAt(i) == ' ') i += 1
    if (i < n) {
      val rest = s.substring(i).trim
      if (rest.nonEmpty) {
        try tsNs = Some(rest.toLong)
        catch { case _: NumberFormatException => return err(s"bad timestamp '$rest'") }
      }
    }

    val fs = fields.result()
    if (fs.isEmpty) err("no fields") else Right(Point(measurement, tags.result(), fs, tsNs))
  }

  private def parseFieldValue(raw: String): Option[FieldValue] = raw match {
    case "t" | "T" | "true" | "True" | "TRUE"     => Some(StringV("true"))
    case "f" | "F" | "false" | "False" | "FALSE"  => Some(StringV("false"))
    case r if r.endsWith("i") || r.endsWith("u") =>
      try Some(FloatV(r.dropRight(1).toLong.toDouble))
      catch { case _: NumberFormatException => None }
    case r =>
      try Some(FloatV(r.toDouble))
      catch { case _: NumberFormatException => None }
  }

  /** Render a point back to line protocol (for property-based round-trip
    * tests and the subscription fan-out path). */
  def render(p: Point): String = {
    def escIdent(x: String) =
      x.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")
    def escMeasurement(x: String) =
      x.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")
    val sb = new StringBuilder(escMeasurement(p.measurement))
    p.tags.foreach { case (k, v) => sb += ','; sb ++= escIdent(k); sb += '='; sb ++= escIdent(v) }
    sb += ' '
    sb ++= p.fields.map {
      case (k, FloatV(v))  => s"${escIdent(k)}=$v"
      case (k, StringV(v)) => escIdent(k) + "=\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString(",")
    p.timestampNs.foreach { t => sb += ' '; sb ++= t.toString }
    sb.result()
  }
}
