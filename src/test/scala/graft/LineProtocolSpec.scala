package graft

import graft.ingest.LineProtocol
import graft.ingest.LineProtocol.{FloatV, StringV}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class LineProtocolSpec extends AnyFunSuite {

  /** Deterministic property runner (scalatestplus bridge isn't in the
    * offline cache, so we drive scalacheck Gens directly). */
  private def forAll[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  test("basic point with tags, fields, timestamp") {
    val Right(p) = LineProtocol.parse(
      "cpu,cpu=cpu0,host=h1 usage_user=12.5,usage_system=3.1 1545424651000000000"): @unchecked
    assert(p.measurement == "cpu")
    assert(p.tags == Seq("cpu" -> "cpu0", "host" -> "h1"))
    assert(p.fields == Seq("usage_user" -> FloatV(12.5), "usage_system" -> FloatV(3.1)))
    assert(p.timestampNs.contains(1545424651000000000L))
  }

  test("no tags") {
    val Right(p) = LineProtocol.parse("mem used_percent=71.2 1545424651000000000"): @unchecked
    assert(p.tags.isEmpty && p.fields == Seq("used_percent" -> FloatV(71.2)))
  }

  test("no timestamp") {
    val Right(p) = LineProtocol.parse("mem,host=h1 used=1"): @unchecked
    assert(p.timestampNs.isEmpty)
  }

  test("integer suffix and booleans") {
    val Right(p) = LineProtocol.parse(
      "syslog,appname=sshd severity_code=6i,facility_code=4u,ok=true,bad=F 1545424651000000000"): @unchecked
    assert(p.fields == Seq("severity_code" -> FloatV(6.0), "facility_code" -> FloatV(4.0),
      "ok" -> StringV("true"), "bad" -> StringV("false")))
  }

  test("quoted string values with escapes") {
    val Right(p) = LineProtocol.parse(
      """syslog,host=h1 message="Accepted \"publickey\" for root",x=1 99"""): @unchecked
    assert(p.fields.head == ("message" -> StringV("""Accepted "publickey" for root""")))
    assert(p.fields(1) == ("x" -> FloatV(1.0)))
  }

  test("escaped comma, space, equals in identifiers") {
    val Right(p) = LineProtocol.parse(
      """my\,meas\ ure,ta\=g=va\,lue fie\ ld=2"""): @unchecked
    assert(p.measurement == "my,meas ure")
    assert(p.tags == Seq("ta=g" -> "va,lue"))
    assert(p.fields == Seq("fie ld" -> FloatV(2.0)))
  }

  test("numeric field keys (reference README example)") {
    val Right(p) = LineProtocol.parse(
      "statistics_method,cseq=OPTIONS 100=1,OPTIONS=1 1545424651000000000"): @unchecked
    assert(p.fields == Seq("100" -> FloatV(1.0), "OPTIONS" -> FloatV(1.0)))
  }

  test("field value 0 stays numeric (documented divergence from cflux.js:362)") {
    val Right(p) = LineProtocol.parse("m v=0 1"): @unchecked
    assert(p.fields == Seq("v" -> FloatV(0.0)))
  }

  test("malformed lines give Left, not throw") {
    assert(LineProtocol.parse("").isLeft)
    assert(LineProtocol.parse("# comment").isLeft)
    assert(LineProtocol.parse("onlymeasurement").isLeft)
    assert(LineProtocol.parse("m,tagnovalue f=1").isLeft)
    assert(LineProtocol.parse("m f=").isLeft)
    assert(LineProtocol.parse("m f=1 notatimestamp").isLeft)
    assert(LineProtocol.parse("""m s="unterminated""").isLeft)
  }

  private val identGen = Gen.nonEmptyListOf(
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(',', ' ', '=', '\\'))).map(_.mkString)
  private val fieldGen: Gen[(String, LineProtocol.FieldValue)] = for {
    k <- identGen
    v <- Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9).map(d => FloatV(math.rint(d * 100) / 100)),
      Gen.asciiPrintableStr.map(StringV.apply))
  } yield (k, v)

  test("property: parse ∘ render is identity") {
    val pointGen = for {
      m <- identGen
      tags <- Gen.mapOf(Gen.zip(identGen, identGen)).map(_.toSeq.sortBy(_._1))
      fields <- Gen.nonEmptyListOf(fieldGen).map(_.distinctBy(_._1))
      ts <- Gen.option(Gen.chooseNum(0L, 2000000000000000000L))
    } yield LineProtocol.Point(m, tags, fields, ts)
    forAll(pointGen) { p =>
      val rendered = LineProtocol.render(p)
      LineProtocol.parse(rendered) match {
        case Right(q) => assert(q == p, s"rendered=<$rendered>")
        case Left(e)  => fail(s"parse failed on <$rendered>: $e")
      }
    }
  }

  test("property: fingerprint is tag-order insensitive") {
    import graft.ingest.Fingerprint
    val rnd = new scala.util.Random(42)
    forAll(Gen.zip(Gen.listOf(Gen.zip(identGen, identGen)), identGen)) { case (tags, field) =>
      val a = Fingerprint.of("m", tags, field)
      val b = Fingerprint.of("m", rnd.shuffle(tags), field)
      assert(a == b)
    }
  }

  test("duration literals") {
    import graft.model.TimeUnits.durationMs
    assert(durationMs("1h") == 3600000L)
    assert(durationMs("5m") == 300000L)
    assert(durationMs("30s") == 30000L)
    assert(durationMs("1h30m") == 5400000L)
    assert(durationMs("100ms") == 100L)
    assert(durationMs("2d") == 172800000L)
    assert(durationMs("1w") == 604800000L)
    assertThrows[IllegalArgumentException](durationMs("xyz"))
  }
}
