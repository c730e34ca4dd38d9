package graft.query

import graft.model.TimeUnits
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled InfluxQL tokenizer + recursive-descent parser.
  *
  * Covers the grammar surface the reference actually consumes
  * (SURVEY §3.2/§3.3). The reference regex-dispatches on raw text
  * (cflux.js:395-852) and pre-rewrites GROUP BY time(...) / LIMIT away
  * (cflux.js:378-385,689); we parse those clauses properly and honor them.
  */
object InfluxQlParser {

  // ---------------------------------------------------------------- tokens
  sealed trait Tok
  final case class Ident(s: String, quoted: Boolean) extends Tok // bare or "double-quoted"
  final case class Str(s: String) extends Tok // 'single-quoted'
  final case class Num(s: String) extends Tok
  final case class Dur(s: String) extends Tok // 1h, 5m, 90s, 1h30m
  final case class Op(s: String) extends Tok // = < > <= >= ( ) , . * - + ::
  final case class Re(s: String) extends Tok // /regex/ measurement ref
  case object Semi extends Tok // statement separator
  /** Sentinel returned by [[P.next]] past the end of input: every `next()`
    * match has a catch-all that turns an unexpected token into Left, so
    * exhaustion reports "got End" instead of throwing (negative-fuzz
    * contract: parse is TOTAL — malformed input is a Left, never a throw). */
  case object End extends Tok

  /** Unquoted keywords after which a '/' opens a regex literal (the
    * positions InfluxQL's grammar allows one: measurement refs and tag
    * matchers). After any OTHER bare identifier — a field ref in an
    * expression — '/' is division. */
  private val RegexCtxKeywords = Set(
    "from", "where", "and", "or", "key", "select", "measurement", "with")

  def tokenize(q: String): Either[String, Vector[Tok]] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == ';') { out += Semi; i += 1 }
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = q.charAt(i)
          if (d == '\\' && i + 1 < n && (q.charAt(i + 1) == quote || q.charAt(i + 1) == '\\')) {
            sb += q.charAt(i + 1); i += 2
          } else if (d == quote) { closed = true; i += 1 }
          else { sb += d; i += 1 }
        }
        if (!closed) return Left(s"unterminated quote at $i")
        out += (if (quote == '"') Ident(sb.result(), quoted = true) else Str(sb.result()))
      } else if (c.isDigit) {
        val start = i
        while (i < n && (q.charAt(i).isDigit || q.charAt(i) == '.')) i += 1
        // duration literal: digits immediately followed by a unit
        val unitStart = i
        while (i < n && q.charAt(i).isLetter) i += 1
        val unit = q.substring(unitStart, i)
        if (unit.nonEmpty && Set("ns", "u", "us", "ms", "s", "m", "h", "d", "w").contains(unit)) {
          // compound durations: keep consuming digit+unit pairs (1h30m)
          var j = i
          var more = true
          while (more && j < n && q.charAt(j).isDigit) {
            var k = j
            while (k < n && q.charAt(k).isDigit) k += 1
            var u = k
            while (u < n && q.charAt(u).isLetter) u += 1
            if (Set("ns", "u", "us", "ms", "s", "m", "h", "d", "w").contains(q.substring(k, u))) j = u
            else more = false
          }
          out += Dur(q.substring(start, j)); i = j
        } else if (unit.nonEmpty) {
          // digits+letters but not a duration — a bare identifier like 100x
          out += Ident(q.substring(start, i), quoted = false)
        } else out += Num(q.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        out += Ident(q.substring(start, i), quoted = false)
      } else if (c == '/') {
        // '/' is EITHER a regex literal (FROM /re/, =~ /re/) or division
        // (mean("a") / 2). Same ambiguity InfluxQL's own scanner has;
        // resolved by the previous token: after a value-ish token (number,
        // duration, ')', or a non-keyword identifier) it is division,
        // anywhere else it opens a regex. '\/' escapes the delimiter.
        val regexCtx = out.lastOption match {
          case None | Some(Op(_)) | Some(Semi) | Some(Str(_)) =>
            out.lastOption != Some(Op(")"))
          case Some(Ident(s, false)) => RegexCtxKeywords.contains(s.toLowerCase)
          case _                     => false
        }
        if (!regexCtx) { out += Op("/"); i += 1 }
        else {
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < n && !closed) {
            val d = q.charAt(i)
            if (d == '\\' && i + 1 < n && q.charAt(i + 1) == '/') { sb += '/'; i += 2 }
            else if (d == '/') { closed = true; i += 1 }
            else { sb += d; i += 1 }
          }
          if (!closed) return Left(s"unterminated regex at $i")
          out += Re(sb.result())
        }
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("<=", ">=", "!=", "<>", "=~", "!~", "::").contains(two)) { out += Op(two); i += 2 }
        else if ("=<>(),.*-+:".indexOf(c) >= 0) { out += Op(c.toString); i += 1 }
        else return Left(s"unexpected char '$c' at $i")
      }
    }
    Right(out.toVector)
  }

  // ---------------------------------------------------------------- parser
  final class P(ts: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < ts.length) Some(ts(pos)) else None
    def peekAt(k: Int): Option[Tok] = if (pos + k < ts.length) Some(ts(pos + k)) else None
    def next(): Tok =
      if (pos < ts.length) { val t = ts(pos); pos += 1; t }
      else { pos += 1; End }
    def done: Boolean = pos >= ts.length
    def kw(s: String): Boolean = peek match {
      case Some(Ident(x, false)) if x.equalsIgnoreCase(s) => pos += 1; true
      case _                                              => false
    }
    def expectKw(s: String): Either[String, Unit] =
      if (kw(s)) Right(()) else Left(s"expected $s at token $pos (${peek})")
    def op(s: String): Boolean = peek match {
      case Some(Op(x)) if x == s => pos += 1; true
      case _                     => false
    }
    def ident(): Either[String, String] = peek match {
      case Some(Ident(s, _)) => pos += 1; Right(s)
      case t                 => Left(s"expected identifier, got $t")
    }
    def str(): Either[String, String] = peek match {
      case Some(Str(s)) => pos += 1; Right(s)
      case t            => Left(s"expected string, got $t")
    }
  }

  /** Parse a single statement; multiple `;`-separated statements are an
    * error here — use [[parseAll]] (the engine's entry point). */
  def parse(query: String): Either[String, Ast.Statement] =
    parseAll(query).flatMap {
      case Seq(one) => Right(one)
      case Seq()    => Left("empty query")
      case many     => Left(s"${many.length} statements; expected one")
    }

  /** Parse a `;`-separated statement list (InfluxDB batches statements in
    * one /query call; the reference regex-dispatches the raw text and
    * handles only the first match). Empty segments are dropped. */
  def parseAll(query: String): Either[String, Seq[Ast.Statement]] =
    tokenize(query).flatMap { ts =>
      val segments = splitOnSemi(ts).filter(_.nonEmpty)
      segments.foldLeft[Either[String, Vector[Ast.Statement]]](Right(Vector.empty)) {
        case (acc @ Left(_), _) => acc
        case (Right(done), seg) => parseTokens(seg, query).map(done :+ _)
      }
    }

  /** Like [[parseAll]] but per-statement: a bad segment yields its own
    * Left without failing the others (InfluxDB reports per-statement
    * errors in batch responses). A lex error fails the whole input. */
  def parseAllLenient(query: String): Seq[Either[String, Ast.Statement]] =
    tokenize(query) match {
      case Left(e)   => Seq(Left(e))
      case Right(ts) => splitOnSemi(ts).filter(_.nonEmpty).map(parseTokens(_, query))
    }

  private def splitOnSemi(ts: Vector[Tok]): Seq[Vector[Tok]] = {
    val out = Vector.newBuilder[Vector[Tok]]
    var cur = Vector.newBuilder[Tok]
    ts.foreach {
      case Semi => out += cur.result(); cur = Vector.newBuilder[Tok]
      case t    => cur += t
    }
    out += cur.result()
    out.result()
  }

  private def parseTokens(ts: Vector[Tok], raw: String): Either[String, Ast.Statement] =
    // total-function boundary: a parser defect on adversarial input must
    // surface as Left, never escape as a throw (NegativeFuzzSpec contract)
    try parseTokensUnsafe(ts, raw)
    catch { case scala.util.control.NonFatal(e) =>
      Left(s"parse error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def parseTokensUnsafe(ts: Vector[Tok], raw: String): Either[String, Ast.Statement] = {
    val p = new P(ts)
    p.peek match {
      case Some(Ident(k, false)) if k.equalsIgnoreCase("SELECT") => parseSelect(p)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("SHOW")   =>
        parseShow(p, raw).flatMap(wrapShowLimit(p, _))
      case Some(Ident(k, false)) if k.equalsIgnoreCase("CREATE") => parseCreate(p, raw)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("DROP")   => parseDrop(p, raw)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("ALTER")  => parseAlter(p, raw)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("DELETE") => parseDelete(p)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("EXPLAIN") =>
        p.next()
        p.kw("ANALYZE") // accepted; we always report the executed plan shape
        parseSelect(p).flatMap {
          case s: Ast.Select => Right(Ast.Explain(s))
          case other         => Left(s"EXPLAIN requires a SELECT, got $other")
        }
      case Some(Ident(k, false)) if k.equalsIgnoreCase("GRANT") =>
        parseGrantRevoke(p, revoke = false)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("REVOKE") =>
        parseGrantRevoke(p, revoke = true)
      case Some(Ident(k, false)) if k.equalsIgnoreCase("KILL") =>
        p.next()
        if (!p.kw("QUERY")) Left("expected QUERY after KILL")
        else p.next() match {
          case Num(s) => s.toLongOption.toRight(s"bad query id $s").map(Ast.KillQuery)
          case t      => Left(s"expected query id, got $t")
        }
      case _                                                     => Right(Ast.Unsupported(raw))
    }
  }

  /** Trailing LIMIT/OFFSET on SHOW listings (InfluxDB paginates SHOW
    * MEASUREMENTS / SERIES / TAG KEYS / TAG VALUES / FIELD KEYS): wraps
    * the statement so the engine slices the listing after the plan.
    * Statements whose responses aren't row listings reject the clause. */
  private def wrapShowLimit(p: P, st: Ast.Statement): Either[String, Ast.Statement] = {
    def intKw(kwName: String): Either[String, Option[Int]] =
      if (!p.kw(kwName)) Right(None)
      else p.next() match {
        case Num(s) => s.toIntOption.map(Some(_)).toRight(s"bad $kwName value $s")
        case t      => Left(s"bad $kwName $t")
      }
    for {
      lim <- intKw("LIMIT")
      off <- intKw("OFFSET")
      out <- (lim, off) match {
        case (None, None) => Right(st)
        case _ => st match {
          case _: Ast.ShowMeasurements | _: Ast.ShowSeries | _: Ast.ShowTagKeys |
               _: Ast.ShowTagValues | _: Ast.ShowFieldKeys | Ast.ShowDatabases =>
            Right(Ast.ShowLimited(st, lim, off))
          case other => Left(s"LIMIT/OFFSET not supported on $other")
        }
      }
    } yield out
  }

  // SELECT f [, f...] [INTO ref] FROM (ref | (SELECT …)) [WHERE ...]
  // [GROUP BY ...] [FILL(x)] [LIMIT n] [OFFSET n] [SLIMIT n] [SOFFSET n]
  private def parseSelect(p: P, nested: Boolean = false,
                          stopAtEnd: Boolean = false): Either[String, Ast.Statement] = {
    p.kw("SELECT")
    val fields = ArrayBuffer.empty[Ast.Field]
    var first = true
    while (first || p.op(",")) {
      first = false
      parseField(p) match {
        case Right(f) => fields += f
        case Left(e)  => return Left(e)
      }
    }
    val into: Option[Ast.TableRef] =
      if (p.kw("INTO")) {
        // :MEASUREMENT backreference (InfluxDB CQ fan-out form), with an
        // optional "rp". / "db"."rp". prefix: INTO "two_weeks".:MEASUREMENT
        // FROM /re/ writes each source into its same-named target
        def colonAhead: Boolean = {
          var k = 0
          while (true) {
            p.peekAt(k) match {
              case Some(Ident(w, false)) if w.equalsIgnoreCase("FROM") => return false
              case Some(Op(":"))                                       => return true
              case Some(_)                                             => k += 1
              case None                                                => return false
            }
          }
          false
        }
        if (colonAhead) {
          val prefix = ArrayBuffer.empty[String]
          while (!p.op(":")) {
            p.next() match {
              case Ident(s, _) => prefix += s
              case Op(".")     => // separator
              case t           => return Left(s"bad INTO backref prefix at $t")
            }
          }
          if (!p.kw("MEASUREMENT")) return Left("expected MEASUREMENT after : in INTO")
          if (prefix.length > 2) return Left("INTO backref prefix is [db.]rp at most")
          val (bdb, brp) = prefix.toSeq match {
            case Seq(rp0)      => (None, Some(rp0))
            case Seq(db0, rp0) => (Some(db0), Some(rp0))
            case _             => (None, None)
          }
          Some(Ast.TableRef(bdb, brp, ":MEASUREMENT"))
        } else
          parseTableRef(p) match { case Right(r) => Some(r); case Left(e) => return Left(e) }
      } else None
    if (!p.kw("FROM")) return Left("expected FROM")
    // FROM (SELECT …): recurse; outer `from` mirrors the innermost ref
    var fromSub: Option[Ast.Select] = None
    val from: Ast.TableRef =
      if (p.op("(")) {
        parseSelect(p, nested = true) match {
          case Right(inner: Ast.Select) =>
            if (!p.op(")")) return Left("expected ) after subquery")
            fromSub = Some(inner)
            inner.from
          case Right(other) => return Left(s"subquery must be a SELECT, got $other")
          case Left(e)      => return Left(e)
        }
      } else parseTableRef(p) match { case Right(r) => r; case Left(e) => return Left(e) }
    // FROM "cpu", "mem": additional comma-separated measurement refs
    val fromMulti = ArrayBuffer.empty[Ast.TableRef]
    if (fromSub.isEmpty) {
      while (p.op(",")) parseTableRef(p) match {
        case Right(r) => fromMulti += r
        case Left(e)  => return Left(e)
      }
    }

    var lower: Option[Ast.TimeExpr] = None
    var upper: Option[Ast.TimeExpr] = None
    var lowerStrict = false
    var upperStrict = false
    val tagFilters = ArrayBuffer.empty[Ast.TagFilter]
    val fieldFilters = ArrayBuffer.empty[Ast.FieldFilter]
    val tagOrGroups = ArrayBuffer.empty[Seq[Ast.TagFilter]]
    if (p.kw("WHERE")) {
      var more = true
      while (more) {
        // parenthesized OR-group of tag predicates:
        // ("host" = 'a' OR "region" =~ /eu.*/ [OR ...])
        if (p.op("(")) {
          val group = ArrayBuffer.empty[Ast.TagFilter]
          var inner = true
          while (inner) {
            parseConjunct(p) match {
              case Right(TagConj(kv)) => group += kv
              case Right(FieldConj(ff)) =>
                return Left(s"field predicate '${ff.name}' not allowed in OR group")
              case Right(_: TimeConj) =>
                return Left("time predicate not allowed in OR group")
              case Left(e) => return Left(e)
            }
            inner = p.kw("OR")
          }
          if (!p.op(")")) return Left("expected ) closing OR group")
          if (group.size == 1) tagFilters += group.head
          else tagOrGroups += group.toSeq
        } else parseConjunct(p) match {
          case Right(TimeConj(isLower, strict, te)) =>
            if (isLower) { lower = Some(te); lowerStrict = strict }
            else { upper = Some(te); upperStrict = strict }
          case Right(TagConj(kv))   => tagFilters += kv
          case Right(FieldConj(ff)) => fieldFilters += ff
          case Left(e)              => return Left(e)
        }
        more = p.kw("AND")
      }
    }

    var gbTime: Option[Long] = None
    var gbOffset = 0L
    val gbTags = ArrayBuffer.empty[String]
    if (p.kw("GROUP")) {
      if (!p.kw("BY")) return Left("expected BY after GROUP")
      var more = true
      while (more) {
        p.peek match {
          case Some(Ident(f, false)) if f.equalsIgnoreCase("time") =>
            p.next()
            if (!p.op("(")) return Left("expected ( after time")
            p.peek match {
              case Some(Dur(d)) => p.next(); gbTime = Some(TimeUnits.durationMs(d))
              case t            => return Left(s"expected duration in time(), got $t")
            }
            // time(x, offset): shift every bucket boundary by the offset
            if (p.op(",")) p.peek match {
              case Some(Dur(d)) => p.next(); gbOffset = TimeUnits.durationMs(d)
              case t            => return Left(s"expected duration offset in time(), got $t")
            }
            if (!p.op(")")) return Left("expected ) after time(dur")
          case Some(Op("*")) => p.next() // GROUP BY * = all tags = default per-series grouping
          case Some(Ident(t, _)) =>
            p.next()
            parseCast(p) match {
              case Left(e)              => return Left(e)
              case Right(Some("field")) => return Left(s"""GROUP BY needs a tag, got "$t"::field""")
              case Right(_)             => gbTags += t
            }
          case t => return Left(s"bad GROUP BY element: $t")
        }
        more = p.op(",")
      }
    }

    var fill: Option[String] = None
    p.peek match {
      case Some(Ident(f, false)) if f.equalsIgnoreCase("FILL") =>
        p.next()
        if (!p.op("(")) return Left("expected ( after FILL")
        val neg = if (p.op("-")) "-" else ""
        val v = p.next() match {
          case Ident(s, _) if neg.isEmpty => s
          case Num(s)                     => neg + s
          case t                          => return Left(s"bad FILL arg $t")
        }
        if (!p.op(")")) return Left("expected ) after FILL(")
        fill = Some(v)
      case _ =>
    }

    var orderDesc = false
    if (p.kw("ORDER")) {
      if (!p.kw("BY")) return Left("expected BY after ORDER")
      p.peek match {
        case Some(Ident(t, _)) if t.equalsIgnoreCase("time") => p.next()
        case t => return Left(s"only ORDER BY time supported, got $t")
      }
      if (p.kw("DESC")) orderDesc = true else { p.kw("ASC"); () }
    }

    // LIMIT/OFFSET page points; SLIMIT/SOFFSET page series (InfluxQL order)
    def intClause(kwName: String): Either[String, Option[Int]] =
      if (!p.kw(kwName)) Right(None)
      else p.peek match {
        case Some(Num(s)) =>
          p.next()
          s.toIntOption match {
            case Some(n) => Right(Some(n))
            case None    => Left(s"bad $kwName value $s")
          }
        case t => Left(s"bad $kwName $t")
      }
    val limit = intClause("LIMIT") match { case Right(v) => v; case Left(e) => return Left(e) }
    val offset = intClause("OFFSET") match { case Right(v) => v; case Left(e) => return Left(e) }
    val slimit = intClause("SLIMIT") match { case Right(v) => v; case Left(e) => return Left(e) }
    val soffset = intClause("SOFFSET") match { case Right(v) => v; case Left(e) => return Left(e) }

    // tz('Zone/Name') — InfluxQL's trailing timezone clause: GROUP BY
    // time buckets align to local wall-clock boundaries in that zone
    var tz: Option[String] = None
    p.peek match {
      case Some(Ident(k, false)) if k.equalsIgnoreCase("tz") =>
        p.next()
        if (!p.op("(")) return Left("expected ( after tz")
        p.next() match {
          case Str(z) => tz = Some(z)
          case t      => return Left(s"expected zone string in tz(), got $t")
        }
        if (!p.op(")")) return Left("expected ) after tz(zone")
      case _ =>
    }

    p.peek match {
      case Some(Op(")")) if nested => // the enclosing parser consumes it
      case Some(Ident(k, false)) if stopAtEnd && k.equalsIgnoreCase("END") => // CQ body
      case Some(t) => return Left(s"unexpected trailing token $t") // no silent drops
      case None =>
    }
    Right(Ast.Select(fields.toSeq, from,
      Ast.TimeBounds(lower, upper, lowerStrict, upperStrict),
      tagFilters.toSeq, gbTime, gbTags.toSeq, fill, limit, orderDesc,
      offset = offset, slimit = slimit, soffset = soffset, fromSub = fromSub,
      groupByTimeOffsetMs = gbOffset, into = into, fieldFilters = fieldFilters.toSeq,
      tagOrGroups = tagOrGroups.toSeq, tz = tz, fromMulti = fromMulti.toSeq))
  }

  /** Window transforms accepted as the OUTER call of a nested
    * `transform(agg("field")[, arg])` (InfluxQL function-of-function). */
  private val TransformFns = Set(
    "derivative", "non_negative_derivative", "difference",
    "non_negative_difference", "moving_average", "cumulative_sum",
    "holt_winters", "holt_winters_with_fit", "exponential_moving_average",
    "double_exponential_moving_average", "chande_momentum_oscillator",
    "kaufmans_efficiency_ratio", "relative_strength_index",
    "triple_exponential_moving_average", "triple_exponential_derivative",
    "kaufmans_adaptive_moving_average")

  // transform(func("name")[, dur|n]) | func("name"[, num]) [AS a] | "name" | *
  /** Unary math transformations (InfluxQL surface); `pow`/`atan2`/`log`
    * take a numeric second argument (`log(field, b)` is log base b).
    * Disjoint from aggregate and window-transform names, so atom dispatch
    * is unambiguous. */
  private val MathFns = Set(
    "abs", "ceil", "floor", "round", "sqrt", "exp", "ln", "log2", "log10", "pow",
    "log", "sin", "cos", "tan", "asin", "acos", "atan", "atan2")

  /** Math functions whose second argument is required. */
  private val MathFnsBinary = Set("pow", "atan2", "log")

  /** One projection: an arithmetic expression over field/aggregate leaves
    * with + - * / precedence and parens, or (the common case) a single
    * leaf. `AS alias` binds to the whole expression. */
  private def parseField(p: P): Either[String, Ast.Field] = {
    parseFieldExpr(p) match {
      case Left(e) => Left(e)
      case Right(Ast.FLeaf(f)) =>
        val alias = if (p.kw("AS")) p.ident().toOption else None
        Right(if (alias.isDefined) f.copy(alias = alias) else f)
      case Right(tree) =>
        val leaves = Ast.FExpr.leaves(tree)
        if (leaves.exists(_.name == "*"))
          return Left("* cannot appear in arithmetic")
        if (leaves.exists(_.transform.isDefined))
          return Left("window transform cannot appear in arithmetic")
        if (leaves.isEmpty)
          return Left("constant-only projection is not a field")
        val alias = if (p.kw("AS")) p.ident().toOption else None
        val derived = tree match {
          case Ast.FMath(fn, _, _) => fn
          case _ => leaves.map(f => f.func.getOrElse(f.name)).distinct.mkString("_")
        }
        Right(Ast.Field(None, derived, alias, expr = Some(tree)))
    }
  }

  private def parseFieldExpr(p: P): Either[String, Ast.FExpr] = {
    var l = parseFieldTerm(p) match { case Right(x) => x; case e => return e }
    var more = true
    while (more) p.peek match {
      case Some(Op(o @ ("+" | "-"))) =>
        p.next()
        parseFieldTerm(p) match {
          case Right(r) => l = Ast.FBin(o, l, r)
          case e        => return e
        }
      case _ => more = false
    }
    Right(l)
  }

  private def parseFieldTerm(p: P): Either[String, Ast.FExpr] = {
    var l = parseFieldAtom(p) match { case Right(x) => x; case e => return e }
    var more = true
    while (more) p.peek match {
      case Some(Op(o @ ("*" | "/"))) =>
        p.next()
        parseFieldAtom(p) match {
          case Right(r) => l = Ast.FBin(o, l, r)
          case e        => return e
        }
      case _ => more = false
    }
    Right(l)
  }

  private def parseFieldAtom(p: P): Either[String, Ast.FExpr] = p.peek match {
    case Some(Num(s)) =>
      p.next()
      s.toDoubleOption.map(v => Ast.FNum(v)).toRight(s"bad number $s")
    case Some(Op("-")) => // unary minus
      p.next()
      parseFieldAtom(p).map(a => Ast.FBin("-", Ast.FNum(0), a))
    case Some(Op("(")) =>
      p.next()
      parseFieldExpr(p).flatMap { e =>
        if (p.op(")")) Right(e) else Left("expected ) in expression")
      }
    case Some(Ident(fn, false))
        if MathFns.contains(fn.toLowerCase) && p.peekAt(1).contains(Op("(")) =>
      p.next(); p.op("(")
      val fnL = fn.toLowerCase
      parseFieldExpr(p).flatMap { x =>
        val arg: Option[Double] =
          if (p.op(",")) p.peek match {
            case Some(Num(s)) => p.next(); s.toDoubleOption
            case t            => return Left(s"bad math argument $t")
          } else None
        if (MathFnsBinary.contains(fnL) && arg.isEmpty)
          Left(s"$fnL needs a second argument")
        else if (!MathFnsBinary.contains(fnL) && arg.isDefined)
          Left(s"$fnL takes one argument")
        else if (!p.op(")")) Left(s"expected ) closing $fnL")
        else Right(Ast.FMath(fnL, x, arg))
      }
    case _ => parseFieldLeaf(p).map(Ast.FLeaf)
  }

  /** Optional `::field` / `::tag` namespace suffix (InfluxQL cast
    * syntax, e.g. `"usage"::field`, `"host"::tag`). Returns the kind
    * consumed, if any; the CALLER decides whether that namespace is
    * legal in its position. */
  private def parseCast(p: P): Either[String, Option[String]] =
    if (p.op("::")) p.next() match {
      case Ident(k, false) if k.equalsIgnoreCase("field") || k.equalsIgnoreCase("tag") =>
        Right(Some(k.toLowerCase))
      case t => Left(s"expected field or tag after ::, got $t")
    } else Right(None)

  private def parseFieldLeaf(p: P): Either[String, Ast.Field] = {
    p.peek match {
      case Some(Op("*")) => p.next(); Right(Ast.Field(None, "*", None))
      case Some(Ident(name, quoted)) =>
        p.next()
        if (!quoted && p.op("(")) {
          // nested call = transform(agg(...)): an unquoted ident directly
          // followed by an open paren
          val nested = (p.peek, p.peekAt(1)) match {
            case (Some(Ident(_, false)), Some(Op("("))) => true
            case _                                      => false
          }
          if (nested) {
            val fnT = name.toLowerCase
            // count(distinct("v")) — InfluxQL's distinct-count aggregate,
            // the one nested call that is NOT a window transform
            if (fnT == "count") {
              p.next() match {
                case Ident(d, _) if d.equalsIgnoreCase("distinct") =>
                case t => return Left(s"only count(distinct(...)) nests in count, got $t")
              }
              p.op("(") // guaranteed by the lookahead
              val innerName = p.next() match {
                case Ident(s, _) => s
                case t           => return Left(s"bad distinct arg $t")
              }
              if (!p.op(")")) return Left("expected ) closing distinct")
              if (!p.op(")")) return Left("expected ) closing count")
              return Right(Ast.Field(Some("count_distinct"), innerName, None))
            }
            if (!TransformFns.contains(fnT))
              return Left(s"unsupported nested function $name")
            val innerFn = p.next() match { case Ident(s, _) => s; case t => return Left(s"bad $t") }
            p.op("(") // guaranteed by the lookahead
            val innerName = p.next() match {
              case Ident(s, _) => s
              case Op("*")     => "*"
              case t           => return Left(s"bad function arg $t")
            }
            parseCast(p) match {
              case Left(e)            => return Left(e)
              case Right(Some("tag")) => return Left("cannot aggregate a ::tag; tags are grouping keys")
              case Right(_)           =>
            }
            val innerArg: Option[Double] =
              if (p.op(",")) p.next() match {
                case Num(n) => n.toDoubleOption match {
                  case some @ Some(_) => some
                  case None           => return Left(s"bad numeric function arg $n")
                }
                case t => return Left(s"bad numeric function arg $t")
              } else None
            if (!p.op(")")) return Left("expected ) closing inner call")
            var durMs: Option[Long] = None
            var nArg: Option[Int] = None
            if (p.op(",")) p.next() match {
              case Dur(d) => durMs = Some(TimeUnits.durationMs(d))
              case Num(s) => s.toIntOption match {
                case Some(n) => nArg = Some(n)
                case None    => return Left(s"bad transform argument $s")
              }
              case t => return Left(s"bad transform argument $t")
            }
            if (!p.op(")")) return Left("expected ) closing transform")
            Right(Ast.Field(Some(innerFn.toLowerCase), innerName, None, innerArg,
              transform = Some(Ast.Transform(fnT, durMs, nArg))))
          } else {
            var innerRe: Option[String] = None
            val inner = p.next() match {
              case Ident(s, _) => s
              case Op("*")     => "*"
              // aggregate over regex fields: mean(/re/) — expands like *
              case Re(re)      => innerRe = Some(re); s"/$re/"
              case t           => return Left(s"bad function arg $t")
            }
            parseCast(p) match {
              case Left(e)            => return Left(e)
              case Right(Some("tag")) => return Left("cannot aggregate a ::tag; tags are grouping keys")
              case Right(_)           => // ::field or none: fields are the default
            }
            var arg: Option[Double] = None
            var argDur: Option[Long] = None
            var selTag: Option[String] = None
            if (p.op(",")) p.next() match {
              case Num(n) => n.toDoubleOption match {
                case Some(d) => arg = Some(d)
                case None    => return Left(s"bad numeric function arg $n")
              }
              case Dur(d) => argDur = Some(TimeUnits.durationMs(d))
              // 3-arg selector form: top("field", "tag", N)
              case Ident(tag, _) if Set("top", "bottom").contains(name.toLowerCase) =>
                selTag = Some(tag)
                if (!p.op(",")) return Left(s"${name.toLowerCase}(field, tag, N) needs N")
                p.next() match {
                  case Num(n) => n.toDoubleOption match {
                    case Some(d) => arg = Some(d)
                    case None    => return Left(s"bad numeric function arg $n")
                  }
                  case t => return Left(s"bad tag-count arg $t")
                }
              case t      => return Left(s"bad numeric function arg $t")
            }
            if (!p.op(")")) return Left("expected )")
            // transform fn DIRECTLY over a raw field — difference("v"),
            // derivative("v", 1s) — InfluxQL's raw-points transform
            // surface (no aggregate, no GROUP BY time)
            if (TransformFns.contains(name.toLowerCase))
              Right(Ast.Field(None, inner, None,
                transform = Some(Ast.Transform(name.toLowerCase,
                  durMs = argDur, n = arg.map(_.toInt)))))
            else
              Right(Ast.Field(Some(name.toLowerCase), inner, None, arg,
                argDur = argDur, selTag = selTag, nameRegex = innerRe))
          }
        } else parseCast(p) match {
          // ::field is a namespace assertion — fields ARE the default
          // identifier namespace here, so it's a no-op; ::tag projection
          // has no standalone-column analogue in the per-series model
          case Left(e)            => Left(e)
          case Right(Some("tag")) =>
            Left(s"""::tag projection is not supported; use GROUP BY "$name" instead""")
          case Right(_)           => Right(Ast.Field(None, name, None))
        }
      // regex field selection: SELECT /usage.*/ — expands to matching
      // field keys at plan time (InfluxDB regex projections)
      case Some(Re(re)) =>
        p.next()
        Right(Ast.Field(None, s"/$re/", None, nameRegex = Some(re)))
      case t => Left(s"bad field $t")
    }
  }

  // "db"."rp"."m" | "db".."m" | "m" | /regex/
  private def parseTableRef(p: P): Either[String, Ast.TableRef] = {
    p.peek match {
      case Some(Re(s)) =>
        p.next()
        return Right(Ast.TableRef(None, None, s"/$s/", regex = Some(s)))
      case _ =>
    }
    val parts = ArrayBuffer.empty[String]
    var more = true
    while (more) {
      p.peek match {
        case Some(Ident(s, _)) => p.next(); parts += s
        case _ if parts.nonEmpty && p.op(".") => parts += "" // "db".."m" empty rp — handled below
        case t => return Left(s"bad table ref at $t")
      }
      more = p.op(".")
      if (more) p.peek match {
        case Some(Op(".")) => // ".." empty rp
          p.next(); parts += ""
          more = true
        case _ =>
      }
    }
    parts.toSeq match {
      case Seq(m)         => Right(Ast.TableRef(None, None, m))
      case Seq(db, m)     => Right(Ast.TableRef(Some(db), None, m))
      case Seq(db, rp, m) => Right(Ast.TableRef(Some(db), Some(rp).filter(_.nonEmpty), m))
      case x              => Left(s"bad table ref $x")
    }
  }

  /** One WHERE conjunct → Left((isLowerBound, timeExpr)) for time bounds,
    * Right((tag, value)) for tag equality (the two conjunct kinds the
    * reference extracts, cflux.js:702-743). */
  private sealed trait Conj
  private final case class TimeConj(isLower: Boolean, strict: Boolean,
                                    te: Ast.TimeExpr) extends Conj
  private final case class TagConj(tf: Ast.TagFilter) extends Conj
  private final case class FieldConj(ff: Ast.FieldFilter) extends Conj

  private def parseConjunct(p: P): Either[String, Conj] = {
    val lhs = p.next() match {
      case Ident(s, _) => s
      case t           => return Left(s"bad WHERE lhs $t")
    }
    val lhsCast = parseCast(p) match {
      case Left(e)  => return Left(e)
      case Right(c) => c
    }
    if (lhs.equalsIgnoreCase("time")) {
      val cmp = p.next() match {
        case Op(o @ (">" | ">=" | "<" | "<=")) => o
        case t                                 => return Left(s"bad time comparator $t")
      }
      val isLower = cmp == ">" || cmp == ">="
      val strict = cmp == ">" || cmp == "<"
      val te: Ast.TimeExpr = p.peek match {
        case Some(Ident(nw, false)) if nw.equalsIgnoreCase("now") =>
          p.next()
          if (!p.op("(") || !p.op(")")) return Left("expected now()")
          if (p.op("-")) p.peek match {
            case Some(Dur(d)) => p.next(); Ast.NowMinus(TimeUnits.durationMs(d))
            case t            => return Left(s"expected duration after now() -, got $t")
          }
          else Ast.Now
        case Some(Num(s))  =>
          p.next()
          s.toLongOption match {
            case Some(n) => Ast.AbsoluteNs(n)
            case None    => return Left(s"bad absolute time literal $s")
          }
        case Some(Dur(d))  => // epoch with precision suffix, e.g. time > 1545424651s
          p.next()
          val (num, unit) = d.span(_.isDigit)
          val factor = unit match {
            case "ns" => 1L
            case "u" | "us" => 1000L
            case "ms" => 1000000L
            case "s" => 1000000000L
            case other => return Left(s"ambiguous epoch suffix '$other' in time literal $d")
          }
          num.toLongOption match {
            case Some(n) => Ast.AbsoluteNs(n * factor)
            case None => return Left(s"bad epoch time literal $d")
          }
        case Some(Str(s))  => p.next(); Ast.DateString(s)
        case t             => return Left(s"bad time rhs $t")
      }
      Right(TimeConj(isLower, strict, te))
    } else {
      val op = p.peek match {
        case Some(Op(o @ ("=" | "!=" | "<>" | "=~" | "!~" | ">" | ">=" | "<" | "<="))) =>
          p.next(); if (o == "<>") "!=" else o
        case t => return Left(s"bad WHERE operator $t after '$lhs'")
      }
      // numeric RHS = FIELD comparison (InfluxQL: tag values are always
      // strings); string/ident RHS with =/!= = tag comparison
      val neg = (op != "=~" && op != "!~") && p.op("-")
      (op, p.next()) match {
        // an explicit ::field cast vetoes the string-RHS = tag-filter
        // inference (and vice versa) — the cast names the namespace
        case ("=" | "!=", Str(s)) if !neg && !lhsCast.contains("field") =>
          Right(TagConj(Ast.TagFilter(lhs, op, s)))
        case ("=" | "!=", Ident(s, _)) if !neg && !lhsCast.contains("field") =>
          Right(TagConj(Ast.TagFilter(lhs, op, s)))
        case ("=~" | "!~", Re(s)) if !lhsCast.contains("field") =>
          Right(TagConj(Ast.TagFilter(lhs, op, s)))
        case (_, Num(n)) if !lhsCast.contains("tag") => n.toDoubleOption match {
          case Some(d) => Right(FieldConj(Ast.FieldFilter(lhs, op, if (neg) -d else d)))
          case None    => Left(s"bad numeric literal $n")
        }
        case (_, Num(_)) => Left(s"'$lhs'::tag cannot compare to a number (tag values are strings)")
        case (_, Str(_)) | (_, Ident(_, _)) =>
          Left(s"'$lhs'::field string comparisons are not supported; use a tag filter")
        case (_, t) => Left(s"bad WHERE rhs $t for '$lhs' $op")
      }
    }
  }

  private def parseShow(p: P, raw: String): Either[String, Ast.Statement] = {
    p.kw("SHOW")
    if (p.kw("DATABASES")) Right(Ast.ShowDatabases)
    else if (p.kw("MEASUREMENTS")) {
      val db = if (p.kw("ON")) p.ident().toOption else None
      // WITH MEASUREMENT =~ /re/ (InfluxDB's measurement filter)
      var regex: Option[String] = None
      if (p.kw("WITH")) {
        if (!p.kw("MEASUREMENT")) return Left("expected MEASUREMENT after WITH")
        if (!p.op("=~")) return Left("expected =~ after WITH MEASUREMENT")
        p.next() match {
          case Re(re) => regex = Some(re)
          case t      => return Left(s"expected /regex/, got $t")
        }
      }
      Right(Ast.ShowMeasurements(db, regex))
    } else if (p.kw("RETENTION")) {
      if (!p.kw("POLICIES")) return Left("expected POLICIES")
      val db = if (p.kw("ON")) p.ident().toOption else None
      Right(Ast.ShowRetentionPolicies(db))
    } else if (p.kw("SUBSCRIPTIONS")) Right(Ast.ShowSubscriptions)
    else if (p.kw("QUERIES")) Right(Ast.ShowQueries)
    else if (p.kw("SHARDS")) Right(Ast.ShowShards)
    else if (p.kw("USERS")) Right(Ast.ShowUsers)
    else if (p.kw("GRANTS")) {
      for {
        _ <- p.expectKw("FOR")
        u <- p.ident()
      } yield Ast.ShowGrants(u)
    }
    else if (p.kw("STATS")) Right(Ast.ShowStats)
    else if (p.kw("DIAGNOSTICS")) Right(Ast.ShowDiagnostics)
    else if (p.kw("CONTINUOUS")) {
      if (!p.kw("QUERIES")) return Left("expected QUERIES after CONTINUOUS")
      Right(Ast.ShowContinuousQueries)
    }
    else if (p.kw("SERIES")) {
      p.kw("EXACT") // SHOW SERIES EXACT CARDINALITY — EXACT is what we compute anyway
      val cardinality = p.kw("CARDINALITY")
      val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
      val filters = parseTagConjuncts(p, "SHOW SERIES", allowRegex = true) match {
        case Right(f) => f
        case Left(e)  => return Left(e)
      }
      Right(if (cardinality) Ast.ShowSeriesCardinality(from)
            else Ast.ShowSeries(from, filters))
    }
    else if (p.kw("MEASUREMENT")) {
      p.kw("EXACT")
      if (!p.kw("CARDINALITY")) return Left("expected CARDINALITY after MEASUREMENT")
      val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
      Right(Ast.ShowCardinality("measurement", from))
    }
    else if (p.kw("FIELD")) {
      if (p.kw("KEYS")) {
        val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
        Right(Ast.ShowFieldKeys(from))
      } else if (p.kw("KEY")) {
        p.kw("EXACT")
        if (!p.kw("CARDINALITY")) return Left("expected CARDINALITY after FIELD KEY")
        val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
        Right(Ast.ShowCardinality("field_key", from))
      } else Left("expected KEYS or KEY after FIELD")
    } else if (p.kw("TAG")) {
      if (p.kw("KEYS")) {
        val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
        parseTagConjuncts(p, "SHOW TAG KEYS", allowRegex = true).map(Ast.ShowTagKeys(from, _))
      } else if (p.kw("KEY")) {
        p.kw("EXACT")
        if (!p.kw("CARDINALITY")) return Left("expected CARDINALITY after TAG KEY")
        val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
        Right(Ast.ShowCardinality("tag_key", from))
      } else if (p.kw("VALUES")) {
        p.kw("EXACT")
        val cardinality = p.kw("CARDINALITY")
        val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
        val keys = ArrayBuffer.empty[String]
        var keyRegex: Option[String] = None
        if (p.kw("WITH")) {
          if (!p.kw("KEY")) return Left("expected KEY")
          if (p.op("=~")) {
            p.next() match {
              case Re(s) => keyRegex = Some(s)
              case t     => return Left(s"bad key regex $t")
            }
          } else if (p.kw("IN")) {
            if (!p.op("(")) return Left("expected (")
            var more = true
            while (more) {
              p.next() match {
                case Ident(s, _) => keys += s
                case Str(s)      => keys += s
                case t           => return Left(s"bad key $t")
              }
              more = p.op(",")
            }
            if (!p.op(")")) return Left("expected )")
          } else if (p.op("=")) {
            p.next() match {
              case Ident(s, _) => keys += s
              case Str(s)      => keys += s
              case t           => return Left(s"bad key $t")
            }
          }
        }
        // trailing WHERE scopes which series contribute pairs
        val filters =
          if (cardinality) Nil
          else parseTagConjuncts(p, "SHOW TAG VALUES", allowRegex = true) match {
            case Right(f) => f
            case Left(e)  => return Left(e)
          }
        Right(
          if (cardinality) Ast.ShowTagValuesCardinality(from, keys.toSeq)
          else Ast.ShowTagValues(from, keys.toSeq, keyRegex, filters))
      } else Left("expected KEYS or VALUES after TAG")
    } else Right(Ast.Unsupported(raw))
  }

  /** Optional trailing `WHERE "tag" = 'v' [AND …]` conjunct list —
    * the grammar shared by DROP SERIES, SHOW SERIES, SHOW TAG KEYS and
    * SHOW TAG VALUES. DROP SERIES keeps InfluxDB's =/!= restriction;
    * the SHOW statements additionally accept =~ and !~ regex matchers
    * (`allowRegex`). */
  private def parseTagConjuncts(p: P, what: String,
                                allowRegex: Boolean = false): Either[String, Seq[Ast.TagFilter]] = {
    val filters = ArrayBuffer.empty[Ast.TagFilter]
    if (p.kw("WHERE")) {
      var more = true
      while (more) {
        val key = p.next() match {
          case Ident(k, _) => k
          case t           => return Left(s"bad $what tag $t")
        }
        val op =
          if (p.op("=")) "=" else if (p.op("!=")) "!="
          else if (allowRegex && p.op("=~")) "=~"
          else if (allowRegex && p.op("!~")) "!~"
          else return Left(s"$what supports ${if (allowRegex) "=, !=, =~ and !~"
            else "= and !="} tag predicates")
        val v = p.next() match {
          case Str(s) => s
          case Re(s) if op == "=~" || op == "!~" => s
          case t      => return Left(s"bad $what tag value $t")
        }
        filters += Ast.TagFilter(key, op, v)
        more = p.kw("AND")
      }
    }
    Right(filters.toSeq)
  }

  private def parseDrop(p: P, raw: String): Either[String, Ast.Statement] = {
    p.kw("DROP")
    if (p.kw("MEASUREMENT")) p.ident().map(Ast.DropMeasurement)
    else if (p.kw("SHARD")) p.next() match {
      case Num(s) => s.toLongOption.toRight(s"bad shard id $s").map(Ast.DropShard)
      case t      => Left(s"expected shard id after DROP SHARD, got $t")
    }
    else if (p.kw("SERIES")) {
      val from = if (p.kw("FROM")) parseTableRef(p).toOption else None
      parseTagConjuncts(p, "DROP SERIES").map(Ast.DropSeries(from, _))
    }
    else if (p.kw("CONTINUOUS")) {
      if (!p.kw("QUERY")) return Left("expected QUERY after CONTINUOUS")
      for {
        name <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
      } yield Ast.DropContinuousQuery(name, db)
    }
    else if (p.kw("DATABASE")) p.ident().map(Ast.DropDatabase)
    else if (p.kw("USER")) p.ident().map(Ast.DropUser)
    else if (p.kw("RETENTION")) {
      if (!p.kw("POLICY")) return Left("expected POLICY after RETENTION")
      for {
        name <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
      } yield Ast.DropRetentionPolicy(name, db)
    } else Right(Ast.Unsupported(raw))
  }

  /** GRANT/REVOKE READ|WRITE|ALL [PRIVILEGES] [ON "db"] TO|FROM "user".
    * ALL without ON is the cluster-admin form (InfluxDB 1.x grammar). */
  private def parseGrantRevoke(p: P, revoke: Boolean): Either[String, Ast.Statement] = {
    p.next() // GRANT | REVOKE
    val priv =
      if (p.kw("READ")) "READ"
      else if (p.kw("WRITE")) "WRITE"
      else if (p.kw("ALL")) { p.kw("PRIVILEGES"); "ALL PRIVILEGES" }
      else return Left("expected READ, WRITE or ALL [PRIVILEGES]")
    val db = if (p.kw("ON")) p.ident() match {
      case Right(d) => Some(d)
      case Left(e)  => return Left(e)
    } else None
    if (priv != "ALL PRIVILEGES" && db.isEmpty)
      return Left(s"$priv requires ON <database>")
    if (!p.kw(if (revoke) "FROM" else "TO"))
      return Left(if (revoke) "expected FROM <user>" else "expected TO <user>")
    p.ident().map(u =>
      if (revoke) Ast.Revoke(priv, db, u) else Ast.Grant(priv, db, u))
  }

  // DELETE FROM "m" [WHERE time-conjuncts] — tag predicates are rejected
  // (point deletion is time-range only; measurement scope via FROM)
  private def parseDelete(p: P): Either[String, Ast.Statement] = {
    p.kw("DELETE")
    if (!p.kw("FROM")) return Left("expected FROM after DELETE")
    val from = parseTableRef(p) match { case Right(r) => r; case Left(e) => return Left(e) }
    var lower: Option[Ast.TimeExpr] = None
    var upper: Option[Ast.TimeExpr] = None
    var lowerStrict = false
    var upperStrict = false
    if (p.kw("WHERE")) {
      var more = true
      while (more) {
        parseConjunct(p) match {
          case Right(TimeConj(isLower, strict, te)) =>
            if (isLower) { lower = Some(te); lowerStrict = strict }
            else { upper = Some(te); upperStrict = strict }
          case Right(TagConj(tf)) =>
            return Left(s"DELETE supports only time predicates, got '${tf.key}'")
          case Right(FieldConj(ff)) =>
            return Left(s"DELETE supports only time predicates, got '${ff.name}'")
          case Left(e) => return Left(e)
        }
        more = p.kw("AND")
      }
    }
    p.peek match {
      case Some(t) => Left(s"unexpected trailing token $t")
      case None => Right(Ast.DeleteFrom(from,
        Ast.TimeBounds(lower, upper, lowerStrict, upperStrict)))
    }
  }

  private def parseCreate(p: P, raw: String): Either[String, Ast.Statement] = {
    p.kw("CREATE")
    if (p.kw("DATABASE")) {
      p.ident().flatMap { name =>
        if (!p.kw("WITH")) Right(Ast.CreateDatabase(name))
        else {
          // WITH [DURATION d] [REPLICATION n] [SHARD DURATION d] [NAME "rp"]
          // in any order; at least one clause (InfluxDB 1.x grammar)
          var dur: Option[Long] = None
          var rpn: Option[String] = None
          var any = false
          var progressed = true
          while (progressed) {
            progressed = false
            if (p.kw("DURATION")) p.next() match {
              case Dur(d) => dur = Some(TimeUnits.durationMs(d)); progressed = true
              case t      => return Left(s"expected duration after DURATION, got $t")
            }
            else if (p.kw("REPLICATION")) p.next() match {
              case Num(_) => progressed = true // accepted, ignored (single store)
              case t      => return Left(s"expected number after REPLICATION, got $t")
            }
            else if (p.kw("SHARD")) {
              if (!p.kw("DURATION")) return Left("expected DURATION after SHARD")
              p.next() match {
                case Dur(_) => progressed = true // accepted, ignored (hour partitions)
                case t      => return Left(s"expected duration after SHARD DURATION, got $t")
              }
            }
            else if (p.kw("NAME")) p.ident() match {
              case Right(n) => rpn = Some(n); progressed = true
              case Left(e)  => return Left(e)
            }
            if (progressed) any = true
          }
          if (!any) Left("WITH needs DURATION, REPLICATION, SHARD DURATION or NAME")
          else Right(Ast.CreateDatabase(name, dur, rpn))
        }
      }
    }
    else if (p.kw("USER")) {
      for {
        name <- p.ident()
        _ <- p.expectKw("WITH")
        _ <- p.expectKw("PASSWORD")
        _ <- p.str() // accepted, never stored
      } yield Ast.CreateUser(name,
        admin = p.kw("WITH") && p.kw("ALL") && { p.kw("PRIVILEGES"); true })
    }
    else if (p.kw("SUBSCRIPTION")) {
      for {
        id <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
        rp <- { p.op("."); p.ident() }
        _ <- p.expectKw("DESTINATIONS")
        _ <- { p.kw("ANY"); p.kw("ALL"); Right(()): Either[String, Unit] }
        url <- p.str()
      } yield Ast.CreateSubscription(id, db, rp, url)
    } else if (p.kw("CONTINUOUS")) {
      if (!p.kw("QUERY")) return Left("expected QUERY after CONTINUOUS")
      for {
        name <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
        resample <- {
          // RESAMPLE [EVERY <dur>] [FOR <dur>] — at least one required
          if (!p.kw("RESAMPLE")) Right((None, None)): Either[String, (Option[Long], Option[Long])]
          else {
            def dur(kwName: String): Either[String, Option[Long]] =
              if (!p.kw(kwName)) Right(None)
              else p.next() match {
                case Dur(d) => Right(Some(TimeUnits.durationMs(d)))
                case t      => Left(s"expected duration after $kwName, got $t")
              }
            for {
              ev <- dur("EVERY")
              fr <- dur("FOR")
              r <- if (ev.isEmpty && fr.isEmpty)
                     Left("RESAMPLE needs EVERY and/or FOR"): Either[String, (Option[Long], Option[Long])]
                   else Right((ev, fr))
            } yield r
          }
        }
        _ <- p.expectKw("BEGIN")
        sel <- parseSelect(p, stopAtEnd = true).flatMap {
          case s: Ast.Select if s.into.isDefined => Right(s)
          case _: Ast.Select => Left("continuous query body needs INTO")
          case other         => Left(s"bad CQ body $other")
        }
        _ <- p.expectKw("END")
      } yield Ast.CreateContinuousQuery(name, db, sel, raw.trim,
        everyMs = resample._1, forMs = resample._2)
    } else if (p.kw("RETENTION")) {
      // CREATE RETENTION POLICY "n" ON "db" DURATION 30d REPLICATION 1 [DEFAULT]
      if (!p.kw("POLICY")) return Left("expected POLICY after RETENTION")
      for {
        name <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
        _ <- p.expectKw("DURATION")
        dur <- (p.next() match {
          case Dur(d) => Right(TimeUnits.durationMs(d))
          case t      => Left(s"expected duration, got $t")
        }): Either[String, Long]
        _ <- p.expectKw("REPLICATION")
        _ <- (p.next() match {
          case Num(_) => Right(())
          case t      => Left(s"expected replication factor, got $t")
        }): Either[String, Unit]
      } yield Ast.CreateRetentionPolicy(name, db, dur, p.kw("DEFAULT"))
    } else Right(Ast.Unsupported(raw))
  }

  /** ALTER RETENTION POLICY "n" ON "db" DURATION 30d [REPLICATION 1]
    * [DEFAULT] — re-registers the policy with the new duration (same
    * registry slot as CREATE). */
  private def parseAlter(p: P, raw: String): Either[String, Ast.Statement] = {
    p.kw("ALTER")
    if (p.kw("RETENTION")) {
      if (!p.kw("POLICY")) return Left("expected POLICY after RETENTION")
      for {
        name <- p.ident()
        _ <- p.expectKw("ON")
        db <- p.ident()
        _ <- p.expectKw("DURATION")
        dur <- (p.next() match {
          case Dur(d) => Right(TimeUnits.durationMs(d))
          case t      => Left(s"expected duration, got $t")
        }): Either[String, Long]
      } yield {
        if (p.kw("REPLICATION")) p.next() // factor accepted, single-node
        Ast.AlterRetentionPolicy(name, db, dur, p.kw("DEFAULT"))
      }
    } else Right(Ast.Unsupported(raw))
  }
}
