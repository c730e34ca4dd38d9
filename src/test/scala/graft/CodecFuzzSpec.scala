package graft

import graft.pipeline.Multimodal
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Totality fuzz for the binary decoders: the documented contract is
  * "a corrupt blob is a row (or None), never an exception" — the
  * round-7 advisor item hardened all size/offset arithmetic to Long,
  * and this suite keeps it honest against three hostile families:
  * random bytes, mutated VALID files (every header field gets hit, incl.
  * extreme dimension/size values that overflow Int arithmetic), and
  * truncations of valid files. */
class CodecFuzzSpec extends AnyFunSuite {

  /** Deterministic property runner (same pattern as LineProtocolSpec —
    * the scalatestplus bridge isn't in the offline cache). */
  private def forAll[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(4242L + i)).foreach(check)
    }

  private def decodeAll(p: Array[Byte]): Unit = {
    Multimodal.decodeBmp(1L, p)
    Multimodal.decodeBmpPixels(p)
    Multimodal.decodeWav(1L, p)
    Multimodal.decodeWavSamples(p)
    Multimodal.decodeVideoFrames(p)
    Multimodal.detectKind(p)
    ()
  }

  private val text = "the quick brown fox jumps over the lazy dog 0123456789"
  private val validBmp = Multimodal.encodeBmp(1L, text, 7, 5)
  private val validWav = Multimodal.encodeWav(text, 33)
  private val validVid = Multimodal.encodeVideo(text, 5, 4, 9)

  test("random byte blobs never throw (all decoders + the router dispatch)") {
    val gen = for {
      n <- Gen.choose(0, 256)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes.toArray
    forAll(gen)(decodeAll)
  }

  test("single-field mutations of valid files never throw — incl. Int-overflow header values") {
    // hostile 4-byte values planted at EVERY offset: the exact family
    // that used to overflow (w*3, pos+8+sz) in Int arithmetic
    val hostile = Seq(0x7fffffff, 0x7ffffffd, 0x80000000, -1, 0x40000000, 54, 1 << 24)
    for {
      base <- Seq(validBmp, validWav, validVid)
      off <- 0 until math.min(base.length - 3, 96)
      v <- hostile
    } {
      val m = base.clone()
      m(off) = (v & 0xff).toByte
      m(off + 1) = ((v >> 8) & 0xff).toByte
      m(off + 2) = ((v >> 16) & 0xff).toByte
      m(off + 3) = ((v >> 24) & 0xff).toByte
      decodeAll(m)
    }
  }

  test("random single-byte mutations and truncations of valid files never throw") {
    val gen = for {
      which <- Gen.choose(0, 2)
      base = Seq(validBmp, validWav, validVid)(which)
      cut <- Gen.choose(0, base.length)
      off <- Gen.choose(0, math.max(base.length - 1, 0))
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield {
      val m = java.util.Arrays.copyOf(base, cut)
      if (off < m.length) m(off) = b
      m
    }
    forAll(gen, n = 600)(decodeAll)
  }
}
