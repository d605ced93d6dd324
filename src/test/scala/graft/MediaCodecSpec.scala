package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{BmpCodec, MediaGen, WavCodec}

/** Byte-level codec checks for the real multimodal tier. The decode
  * queries are additionally oracle-hash-checked end-to-end; this spec
  * pins the parts an aggregate could mask: exact pixel order, row
  * padding, bottom-up flip, chunk walking, and profile rejection.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def rngPixels(seed: Long, n: Int): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256))
  }

  test("BMP round-trip preserves exact pixels across padding widths") {
    // 3w mod 4 cycles 0..3 over these widths: every padding case
    for (w <- 1 to 9; h <- Seq(1, 2, 5)) {
      val px = rngPixels(w * 100 + h, 3 * w * h)
      val (w2, h2, back) = BmpCodec.decode(BmpCodec.encode(w, h, px))
      assert(w2 == w && h2 == h)
      assert(back.sameElements(px), s"pixel mismatch at ${w}x$h")
    }
  }

  test("BMP layout golden: 2x1 image bytes are exactly as specified") {
    // pixels: (r,g,b) = (1,2,3), (4,5,6) → one row, BGR order, 2 pad
    val bytes = BmpCodec.encode(2, 1, Array(1, 2, 3, 4, 5, 6))
    assert(bytes.length == 54 + 8)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    assert((bytes(28) & 0xFF) == 24) // bpp
    assert(bytes.slice(54, 60).map(_.toInt).toSeq ==
      Seq(3, 2, 1, 6, 5, 4)) // BGR, BGR
    assert(bytes(60) == 0 && bytes(61) == 0) // row pad
  }

  test("BMP stores rows bottom-up (first stored row is the image bottom)") {
    // 1x2: top pixel red=200, bottom pixel red=100
    val bytes = BmpCodec.encode(1, 2, Array(200, 0, 0, 100, 0, 0))
    // stored row 0 = bottom image row → its R byte (offset+2) is 100
    assert((bytes(54 + 2) & 0xFF) == 100)
    assert((bytes(54 + BmpCodec.rowSize(1) + 2) & 0xFF) == 200)
  }

  test("BMP rejects non-BMP, top-down, non-24bpp payloads") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2)))
    val good = BmpCodec.encode(2, 2, rngPixels(1, 12))
    val topDown = good.clone()
    // height := -2 (top-down profile)
    topDown(22) = (-2 & 0xFF).toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(topDown))
    val bpp8 = good.clone(); bpp8(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode(bpp8))
  }

  test("nearest-neighbor resize: identity and constant cases, exact map") {
    val px = rngPixels(7, 3 * 5 * 4)
    assert(BmpCodec.resizeNearest(5, 4, px, 5, 4).sameElements(px))
    val const = Array.fill(3 * 2 * 2)(9)
    assert(BmpCodec.resizeNearest(2, 2, const, 8, 8)
      .sameElements(Array.fill(3 * 64)(9)))
    // exact integer-floor mapping: out(x2,y2) == src(x2*w/8, y2*h/8)
    val (w, h) = (5, 4)
    val out = BmpCodec.resizeNearest(w, h, px, 8, 8)
    for (y2 <- 0 until 8; x2 <- 0 until 8; c <- 0 until 3) {
      val sp = 3 * ((y2 * h / 8) * w + (x2 * w / 8)) + c
      assert(out(3 * (y2 * 8 + x2) + c) == px(sp))
    }
  }

  test("WAV round-trip preserves rate and exact samples incl. extremes") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = WavCodec.decode(WavCodec.encode(22050, samples))
    assert(wav.sampleRate == 22050)
    assert(wav.samples.sameElements(samples))
  }

  test("WAV decoder walks unknown chunks before data (real-world files)") {
    val base = WavCodec.encode(8000, Array[Short](5, -5, 7))
    // splice a LIST chunk (id+size+3 bytes body, padded to word) between
    // fmt and data
    val listChunk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = base.slice(0, 36) ++ listChunk ++ base.drop(36)
    // fix RIFF size field
    val total = spliced.length - 8
    spliced(4) = (total & 0xFF).toByte
    spliced(5) = ((total >> 8) & 0xFF).toByte
    val wav = WavCodec.decode(spliced)
    assert(wav.sampleRate == 8000 &&
      wav.samples.sameElements(Array[Short](5, -5, 7)))
  }

  test("WAV rejects non-PCM and stereo profiles") {
    val good = WavCodec.encode(8000, Array[Short](1, 2))
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
  }

  test("MediaGen fixtures decode back to their generative formulas") {
    for (docId <- Seq(0L, 1L, 17L, 499L)) {
      val (w, h, rgb) = BmpCodec.decode(MediaGen.imageBytes(docId))
      assert((w, h) == MediaGen.imageDims(docId))
      assert(rgb.sameElements(MediaGen.imagePixels(docId)))
      val wav = WavCodec.decode(MediaGen.wavBytes(docId))
      assert(wav.sampleRate == MediaGen.wavRate(docId))
      assert(wav.samples.sameElements(MediaGen.wavSamples(docId)))
    }
  }
}
