package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{MediaGen, PngCodec}

/** PNG codec: lossless round-trips across all five scanline filters,
  * multi-IDAT reassembly, and rejection of out-of-scope or corrupt
  * streams. */
class PngCodecSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, rgb: Array[Int]): Unit = {
    val png = PngCodec.decode(PngCodec.encode(w, h, rgb))
    assert(png.width == w && png.height == h)
    assert(png.rgb.toSeq == rgb.toSeq, s"pixels differ at ${w}x$h")
  }

  test("lossless round-trip over fixture formulas (all filters hit)") {
    // heights >= 5 ensure rows with filter types 0..4 all occur
    Seq(0L, 1L, 7L, 123L, 499L).foreach { id =>
      val (w, h) = MediaGen.pngDims(id)
      assert(h >= 5, "fixture must exercise all five filters")
      roundTrip(w, h, MediaGen.pngPixels(id))
    }
  }

  test("round-trip on adversarial pixel patterns") {
    // constant, max-value, gradient, and pseudo-random (Paeth-heavy)
    roundTrip(3, 7, Array.fill(3 * 3 * 7)(0))
    roundTrip(3, 7, Array.fill(3 * 3 * 7)(255))
    roundTrip(16, 6, Array.tabulate(3 * 16 * 6)(j => j % 256))
    val rng = new scala.util.Random(42)
    roundTrip(11, 9, Array.fill(3 * 11 * 9)(rng.nextInt(256)))
    roundTrip(1, 5, Array.tabulate(15)(j => (j * 37) % 256)) // 1-px rows
  }

  test("multi-IDAT streams reassemble") {
    val (w, h) = (6, 6)
    val rgb = Array.tabulate(3 * w * h)(j => (j * 7) % 256)
    val whole = PngCodec.encode(w, h, rgb)
    // re-split the single IDAT into two chunks by hand
    def u32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    val ihdrEnd = 8 + 12 + 13
    val idatLen = u32(whole, ihdrEnd)
    val payload = whole.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val cut = payload.length / 2
    def chunk(typ: String, p: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + p.length)
      out(0) = ((p.length >>> 24) & 0xFF).toByte
      out(1) = ((p.length >>> 16) & 0xFF).toByte
      out(2) = ((p.length >>> 8) & 0xFF).toByte
      out(3) = (p.length & 0xFF).toByte
      typ.zipWithIndex.foreach { case (c, i) => out(4 + i) = c.toByte }
      System.arraycopy(p, 0, out, 8, p.length)
      val crc = new java.util.zip.CRC32
      crc.update(out, 4, 4 + p.length)
      val v = crc.getValue
      out(8 + p.length) = ((v >>> 24) & 0xFF).toByte
      out(9 + p.length) = ((v >>> 16) & 0xFF).toByte
      out(10 + p.length) = ((v >>> 8) & 0xFF).toByte
      out(11 + p.length) = (v & 0xFF).toByte
      out
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(whole, 0, ihdrEnd) // signature + IHDR
    bos.write(chunk("IDAT", payload.take(cut)))
    bos.write(chunk("IDAT", payload.drop(cut)))
    bos.write(chunk("IEND", Array.empty[Byte]))
    val png = PngCodec.decode(bos.toByteArray)
    assert(png.rgb.toSeq == rgb.toSeq, "multi-IDAT decode differs")
  }

  test("corruption and out-of-scope streams reject with diagnostics") {
    val good = PngCodec.encode(4, 5, Array.tabulate(60)(_ % 256))
    // flipped payload byte -> CRC catches it
    val crcBad = good.clone()
    crcBad(8 + 12 + 13 + 8 + 2) = (crcBad(8 + 12 + 13 + 8 + 2) ^ 1).toByte
    val e1 = intercept[IllegalArgumentException](PngCodec.decode(crcBad))
    assert(e1.getMessage.contains("CRC"))
    // truncation mid-chunk
    val e2 = intercept[IllegalArgumentException](
      PngCodec.decode(good.take(good.length - 6)))
    assert(e2.getMessage.toLowerCase.contains("truncated"))
    // bad signature
    val sigBad = good.clone(); sigBad(0) = 'X'.toByte
    val e3 = intercept[IllegalArgumentException](PngCodec.decode(sigBad))
    assert(e3.getMessage.contains("signature"))
    // out-of-scope color type (palette): patch IHDR + fix its CRC
    val pal = good.clone()
    pal(8 + 8 + 9) = 3 // color type byte inside IHDR payload
    val crc = new java.util.zip.CRC32
    crc.update(pal, 8 + 4, 4 + 13)
    val v = crc.getValue
    pal(8 + 8 + 13) = ((v >>> 24) & 0xFF).toByte
    pal(8 + 9 + 13) = ((v >>> 16) & 0xFF).toByte
    pal(8 + 10 + 13) = ((v >>> 8) & 0xFF).toByte
    pal(8 + 11 + 13) = (v & 0xFF).toByte
    val e4 = intercept[IllegalArgumentException](PngCodec.decode(pal))
    assert(e4.getMessage.contains("unsupported"))
  }

  test("FDICT (preset-dictionary) zlib streams reject instead of " +
    "hanging the inflate loop") {
    val good = PngCodec.encode(4, 5, Array.tabulate(60)(_ % 256))
    // rewrite the IDAT payload's zlib header: CMF 0x78, FLG with the
    // FDICT bit set + FCHECK adjusted so (CMF*256+FLG) % 31 == 0,
    // followed by a fake 4-byte DICTID; then re-CRC the chunk
    val ihdrEnd = 8 + 12 + 13
    def u32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    val idatLen = u32(good, ihdrEnd)
    val payload = good.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val cmf = 0x78
    val flgBase = 0x20 // FDICT set, level 0
    val flg = flgBase + (31 - (cmf * 256 + flgBase) % 31) % 31
    val dictPayload =
      Array(cmf.toByte, flg.toByte, 1.toByte, 2.toByte, 3.toByte,
        4.toByte) ++ payload.drop(2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, ihdrEnd)
    val chunk = new Array[Byte](12 + dictPayload.length)
    chunk(0) = ((dictPayload.length >>> 24) & 0xFF).toByte
    chunk(1) = ((dictPayload.length >>> 16) & 0xFF).toByte
    chunk(2) = ((dictPayload.length >>> 8) & 0xFF).toByte
    chunk(3) = (dictPayload.length & 0xFF).toByte
    "IDAT".zipWithIndex.foreach { case (c, i) => chunk(4 + i) = c.toByte }
    System.arraycopy(dictPayload, 0, chunk, 8, dictPayload.length)
    val crc = new java.util.zip.CRC32
    crc.update(chunk, 4, 4 + dictPayload.length)
    val v = crc.getValue
    chunk(8 + dictPayload.length) = ((v >>> 24) & 0xFF).toByte
    chunk(9 + dictPayload.length) = ((v >>> 16) & 0xFF).toByte
    chunk(10 + dictPayload.length) = ((v >>> 8) & 0xFF).toByte
    chunk(11 + dictPayload.length) = (v & 0xFF).toByte
    out.write(chunk)
    out.write(good, ihdrEnd + 12 + idatLen,
      good.length - (ihdrEnd + 12 + idatLen))
    val e = intercept[IllegalArgumentException](
      PngCodec.decode(out.toByteArray))
    assert(e.getMessage.contains("dictionary")
      || e.getMessage.contains("prematurely"),
      s"wrong diagnostic: ${e.getMessage}")
  }

  test("surplus pixel data rejects: stream inflating past IHDR dims " +
    "must not decode as a silently truncated image") {
    // encode 4x6, then patch IHDR to claim height 5 (and re-CRC): the
    // zlib stream still carries 6 rows, so inflation does not END at
    // the declared 5-row buffer
    val good = PngCodec.encode(4, 6, Array.tabulate(72)(_ % 256))
    val shrunk = good.clone()
    shrunk(8 + 8 + 7) = 5 // height LSB inside IHDR payload (big-endian)
    val crc = new java.util.zip.CRC32
    crc.update(shrunk, 8 + 4, 4 + 13)
    val v = crc.getValue
    shrunk(8 + 8 + 13) = ((v >>> 24) & 0xFF).toByte
    shrunk(8 + 9 + 13) = ((v >>> 16) & 0xFF).toByte
    shrunk(8 + 10 + 13) = ((v >>> 8) & 0xFF).toByte
    shrunk(8 + 11 + 13) = (v & 0xFF).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(shrunk))
    assert(e.getMessage.contains("does not end"),
      s"wrong diagnostic: ${e.getMessage}")
  }
}
