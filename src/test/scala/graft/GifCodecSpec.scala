package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{GifCodec, MediaGen}

/** GIF89a codec: lossless round-trips through real variable-width LZW
  * (dictionary growth to 12 bits, CLEAR reset, KwKwK), sub-block
  * framing, and explicit scope rejections. */
class GifCodecSpec extends AnyFunSuite {

  test("multi-frame round-trip is lossless") {
    for (id <- Seq(0L, 1L, 7L, 38L, 123L)) {
      val (w, h) = MediaGen.gifDims(id)
      val frames =
        Array.tabulate(MediaGen.gifFrameCount(id))(
          f => MediaGen.gifFrameIndices(id, f))
      val gif = GifCodec.decode(GifCodec.encode(w, h, frames))
      assert(gif.width == w && gif.height == h)
      assert(gif.frames.length == frames.length)
      gif.frames.zip(frames).foreach { case (got, want) =>
        assert(got.toSeq == want.toSeq)
      }
      assert(gif.palette.length == GifCodec.PaletteSize)
      assert(gif.palette(5) == GifCodec.paletteColor(5))
    }
  }

  test("per-frame delays round-trip (r12 advice: variable-delay " +
    "re-encode must preserve each frame's timing)") {
    val frames = Array.tabulate(4)(f =>
      Array.fill(9)((f % GifCodec.PaletteSize).toByte))
    val delays = Array(0, 7, 120, 33)
    val gif = GifCodec.decode(GifCodec.encode(3, 3, frames, delays))
    assert(gif.delaysCs.toSeq == delays.toSeq)
    // and the uniform overload still stamps every frame the same
    val uni = GifCodec.decode(GifCodec.encode(3, 3, frames, 25))
    assert(uni.delaysCs.toSeq == Seq(25, 25, 25, 25))
  }

  test("LZW survives dictionary growth to 12-bit codes and CLEAR reset") {
    // 120x120 = 14 400 px of slowly-varying data: the dictionary blows
    // past every code-width boundary and the 4096 cap (forcing the
    // mid-stream CLEAR), and the stream spans many 255-byte sub-blocks
    val n = 120 * 120
    val px = Array.tabulate(n)(j => ((j * j / 7 + j / 3) % 16).toByte)
    val gif = GifCodec.decode(GifCodec.encode(120, 120, Array(px)))
    assert(gif.frames.head.toSeq == px.toSeq)
  }

  test("LZW KwKwK self-reference case (long runs) is exact") {
    // runs of one symbol make the encoder emit codes the decoder has
    // not finished defining — the classic KwKwK path
    val px = Array.fill(500)(3.toByte) ++ Array.fill(300)(9.toByte)
    val gif = GifCodec.decode(GifCodec.encode(40, 20, Array(px)))
    assert(gif.frames.head.toSeq == px.toSeq)
  }

  test("raw LZW encode/decode round-trips arbitrary index streams") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val n = 1 + rng.nextInt(3000)
      val px = Array.fill(n)(rng.nextInt(16).toByte)
      val out = GifCodec.lzwDecode(
        GifCodec.lzwEncode(px, GifCodec.PaletteBits),
        GifCodec.PaletteBits, n)
      assert(out.toSeq == px.toSeq)
    }
  }

  test("truncated streams reject with a diagnostic, not a raw AIOOBE") {
    val valid = GifCodec.encode(6, 6, Array(
      Array.tabulate(36)(j => (j % 16).toByte)))
    // missing trailer
    val e1 = intercept[IllegalArgumentException] {
      GifCodec.decode(valid.dropRight(1))
    }
    assert(e1.getMessage.contains("gif:"))
    // cut mid-sub-block
    val e2 = intercept[IllegalArgumentException] {
      GifCodec.decode(valid.dropRight(valid.length / 3))
    }
    assert(e2.getMessage.contains("gif:"))
  }

  test("out-of-scope and junk streams are rejected, never misparsed") {
    intercept[IllegalArgumentException] {
      GifCodec.decode("GIF87athisisnotavalidstream".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      GifCodec.decode(Array.fill[Byte](40)(0x2a))
    }
    // interlace flag set → explicit rejection
    val ok = GifCodec.encode(4, 4, Array(Array.fill(16)(1.toByte)))
    val start = ok.indexOfSlice(Array(0x2c.toByte))
    val broken = ok.clone()
    broken(start + 9) = (broken(start + 9) | 0x40).toByte
    intercept[IllegalArgumentException] { GifCodec.decode(broken) }
  }
}
