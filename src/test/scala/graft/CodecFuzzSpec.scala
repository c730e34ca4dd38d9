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
    Multimodal.decodePngPixels(p)
    Multimodal.decodeGifPixels(p)
    Multimodal.decodeJpegPixels(p)
    Multimodal.detectKind(p)
    ()
  }

  private val text = "the quick brown fox jumps over the lazy dog 0123456789"
  private val validBmp = Multimodal.encodeBmp(1L, text, 7, 5)
  private val validWav = Multimodal.encodeWav(text, 33)
  private val validVid = Multimodal.encodeVideo(text, 5, 4, 9)
  private val validPng = Multimodal.encodePng(text, 6, 8)
  private val validGif = Multimodal.encodeGif(text, 7, 5)
  private val validJpg = Multimodal.encodeJpeg(text, 16, 24)

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
      base <- Seq(validBmp, validWav, validVid, validPng, validGif, validJpg)
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
      which <- Gen.choose(0, 5)
      base = Seq(validBmp, validWav, validVid, validPng, validGif, validJpg)(which)
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

  test("png: decode∘encode is the pixel identity, with all five filters exercised") {
    val w = 6; val h = 8 // h ≥ 5 → scanline filters 0..4 all present (y % 5)
    val px = Array.tabulate(w * h * 3)(j => (j * 37 + 11) % 256)
    val got = Multimodal.decodePngPixels(Multimodal.encodePngPixels(px, w, h))
    assert(got.isDefined)
    val (gw, gh, gp) = got.get
    assert(gw === w && gh === h)
    assert(gp.toSeq === px.toSeq)
  }

  test("png: any single-byte corruption is caught by the CRC chunk walk (None, not garbage)") {
    // flip one byte in every position AFTER the 8-byte signature: each
    // lands inside some chunk's length/type/data/crc and must fail the
    // CRC or structural check — a PNG decode never returns wrong pixels
    val orig = Multimodal.decodePngPixels(validPng).get._3.toSeq
    (8 until validPng.length).foreach { off =>
      val m = validPng.clone()
      m(off) = (m(off) ^ 0x5a).toByte
      Multimodal.decodePngPixels(m) match {
        case None => ()
        case Some((_, _, px)) =>
          // the only acceptable survivor is a flip that left the stream
          // semantically identical — impossible for xor 0x5a, so fail
          assert(px.toSeq === orig, s"corrupt byte at $off decoded differently")
          fail(s"corrupt byte at $off not rejected")
      }
    }
  }

  test("gif: LZW decode∘encode is the index identity, through the 4096 dict reset") {
    // high-entropy indices grow the dictionary ~1 entry per emitted code,
    // so 12k pixels cross the 4096-code reset (CLEAR mid-stream) — the
    // decode must resynchronize and still recover every index
    val w = 120; val h = 100
    val idx = Array.tabulate(w * h)(j => ((j * 2654435761L >>> 8) & 0xff).toInt)
    val got = Multimodal.decodeGifPixels(Multimodal.encodeGifPixels(idx, w, h))
    assert(got.isDefined)
    val (gw, gh, px) = got.get
    assert(gw === w && gh === h)
    assert(px.toSeq === idx.toSeq)
    // and the repetitive worst case (KwKwK chains): constant + period-2
    Seq(Array.fill(500)(7), Array.tabulate(500)(j => j % 2)).foreach { a =>
      val r = Multimodal.decodeGifPixels(Multimodal.encodeGifPixels(a, 50, 10))
      assert(r.isDefined && r.get._3.toSeq === a.toSeq)
    }
  }

  test("gif: final data code landing exactly on a width boundary keeps EOI in sync") {
    // all-distinct-pairs streams emit one data code per pixel; n pixels →
    // decoder nextCode = 258 + n - 1 after the last code, so n = 255 lands
    // the post-final-code bump exactly at 512 = 1<<9 (the encoder must
    // widen EOI to 10 bits to match). Bracket the boundary ±1, and the
    // 10-bit boundary (n = 767) too.
    // every adjacent byte-pair distinct → every step is a dict miss → one
    // data code per pixel (blocks a,k,a,k+1,… enumerate pairs (a,k),(k,a)
    // each at most once; block transitions contribute unique (255,a+1))
    def allMiss(n: Int): Array[Int] = {
      val buf = new scala.collection.mutable.ArrayBuffer[Int](n + 2)
      var a = 0
      while (buf.length < n && a < 255) {
        var k = a + 1
        while (k <= 255 && buf.length < n) { buf += a; buf += k; k += 1 }
        a += 1
      }
      buf.take(n).toArray
    }
    Seq(254, 255, 256, 767).foreach { n =>
      val idx = allMiss(n)
      val r = Multimodal.decodeGifPixels(Multimodal.encodeGifPixels(idx, n, 1))
      assert(r.isDefined, s"n=$n: boundary EOI desync")
      assert(r.get._3.toSeq === idx.toSeq, s"n=$n: pixels differ")
    }
  }

  test("jpeg: decode∘encode is the pixel identity on 8×8 block-constant images") {
    // a constant block has only a DC coefficient; with all-ones quant
    // tables the float DCT/IDCT pair is exact on it — the exactness
    // domain the oracle-gated entry (mm_jpeg_roundtrip) relies on
    val w = 16; val h = 24
    val tiles = Array(0, 255, 128, 7, 200, 64) // extremes + mid values
    val px = Array.tabulate(w * h) { k =>
      tiles(((k / (w * 8)) * (w / 8) + (k % w) / 8) % tiles.length)
    }
    val got = Multimodal.decodeJpegPixels(Multimodal.encodeJpegPixels(px, w, h))
    assert(got.isDefined)
    val (gw, gh, gp) = got.get
    assert(gw === w && gh === h)
    assert(gp.toSeq === px.toSeq)
  }

  test("jpeg: arbitrary images round-trip within the quantizer error bound") {
    // quant=1 ⇒ per-coefficient rounding error ≤ 0.5 ⇒ per-pixel IDCT
    // error ≤ 0.25·Σ|cucv·0.5| = 8 worst-case; measure ≤ 4 in practice
    // and non-8-multiple dims exercise the edge-replication path
    for ((w, h) <- Seq((16, 16), (13, 9), (8, 25))) {
      val px = Array.tabulate(w * h)(j => ((j * 2654435761L >>> 7) & 0xff).toInt)
      val got = Multimodal.decodeJpegPixels(Multimodal.encodeJpegPixels(px, w, h))
      assert(got.isDefined, s"${w}x$h")
      val (gw, gh, gp) = got.get
      assert(gw === w && gh === h)
      var maxErr = 0
      var k = 0
      while (k < px.length) {
        maxErr = math.max(maxErr, math.abs(gp(k) - px(k))); k += 1
      }
      assert(maxErr <= 8, s"${w}x$h: max per-pixel error $maxErr > quantizer bound")
    }
  }

  test("jpeg: non-baseline and hostile structures are rejected, never thrown") {
    // progressive SOF2 instead of SOF0
    assert(Multimodal.decodeJpegPixels(mark(validJpg, 0xc0, 0xc2)).isEmpty)
    // 16-bit precision claim
    val deep = validJpg.clone()
    val at = sofIdx(deep, 0xc0)
    deep(at + 4) = 16
    assert(Multimodal.decodeJpegPixels(deep).isEmpty)
    // dimension bomb: SOF h×w = 65535×65535 > the 2^26 pixel bound
    val bomb = validJpg.clone()
    val sa = sofIdx(bomb, 0xc0)
    bomb(sa + 5) = 0xff.toByte; bomb(sa + 6) = 0xff.toByte
    bomb(sa + 7) = 0xff.toByte; bomb(sa + 8) = 0xff.toByte
    assert(Multimodal.decodeJpegPixels(bomb).isEmpty)
    // truncated entropy stream (cut before EOI)
    assert(Multimodal.decodeJpegPixels(
      java.util.Arrays.copyOf(validJpg, validJpg.length - 4)).isEmpty)
  }

  /** Offset of the 0xFF byte of the first marker `m` in a JPEG. */
  private def sofIdx(p: Array[Byte], m: Int): Int = {
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == m) return i
      i += 1
    }
    -1
  }

  private def mark(p: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val m = p.clone()
    val i = sofIdx(m, from)
    if (i >= 0) m(i + 1) = to.toByte
    m
  }

  test("png: zip-bomb dims are rejected before inflating (IHDR bound)") {
    // forge IHDR claiming 20000x20000 (raw ≈ 1.2 GB > the 64 MiB bound);
    // re-CRC the chunk so only the size guard can reject it
    val m = validPng.clone()
    def putBE(off: Int, v: Int): Unit = {
      m(off) = (v >>> 24).toByte; m(off + 1) = (v >>> 16).toByte
      m(off + 2) = (v >>> 8).toByte; m(off + 3) = v.toByte
    }
    putBE(16, 20000); putBE(20, 20000)
    val crc = new java.util.zip.CRC32
    crc.update(m, 12, 17)
    putBE(29, crc.getValue.toInt)
    assert(Multimodal.decodePngPixels(m).isEmpty)
  }
}
