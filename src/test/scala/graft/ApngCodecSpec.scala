package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{ApngCodec, MediaGen}

/** APNG container: round-trip fidelity, sampled decode, and the
  * framing guards (sequence numbering, acTL/fcTL consistency,
  * full-frame scope). */
class ApngCodecSpec extends AnyFunSuite {

  test("lossless round-trip over fixture formulas (all frames)") {
    for (id <- Seq(0L, 1L, 7L, 23L, 101L)) {
      val apng = ApngCodec.decode(MediaGen.apngBytes(id))
      val (w, h) = MediaGen.apngDims(id)
      assert((apng.width, apng.height) == (w, h))
      assert(apng.frames.length == MediaGen.apngFrameCount(id))
      for (f <- apng.frames.indices)
        assert(apng.frames(f).toSeq ==
          MediaGen.apngFramePixels(id, f).toSeq, s"doc $id frame $f")
    }
  }

  test("sampled decode returns exactly the selected frames with " +
    "correct indices and total count") {
    val id = 5L // 2 + 5%4 = 3 frames
    val (w, h, n, frames, _) = ApngCodec.decodeSampled(
      MediaGen.apngBytes(id), (idx, _) => idx % 2 == 0)
    assert((w, h) == MediaGen.apngDims(id))
    assert(n == 3)
    assert(frames.map(_._1) == Seq(0, 2))
    for ((fi, rgb) <- frames)
      assert(rgb.toSeq == MediaGen.apngFramePixels(id, fi).toSeq)
  }

  test("sequence breaks, partial frames and frame-count mismatches " +
    "reject with diagnostics") {
    val good = MediaGen.apngBytes(3L)
    // find the first fcTL chunk and corrupt its sequence number
    def findChunk(b: Array[Byte], typ: String, from: Int = 8): Int = {
      var off = from
      while (off + 8 <= b.length) {
        val t = new String(b, off + 4, 4, "US-ASCII")
        if (t == typ) return off
        val len = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
          ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
        off += 12 + len
      }
      -1
    }
    def reCrc(b: Array[Byte], off: Int): Unit = {
      val len = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len)
      val v = crc.getValue
      b(off + 8 + len) = ((v >>> 24) & 0xFF).toByte
      b(off + 9 + len) = ((v >>> 16) & 0xFF).toByte
      b(off + 10 + len) = ((v >>> 8) & 0xFF).toByte
      b(off + 11 + len) = (v & 0xFF).toByte
    }
    // sequence break: first fcTL claims seq 5
    val seqBad = good.clone()
    val fctl = findChunk(seqBad, "fcTL")
    assert(fctl > 0)
    seqBad(fctl + 11) = 5
    reCrc(seqBad, fctl)
    val e1 = intercept[IllegalArgumentException](ApngCodec.decode(seqBad))
    assert(e1.getMessage.contains("sequence break"))
    // partial frame: shrink the first fcTL's frame width by one
    val partBad = good.clone()
    partBad(partBad.length - 1) = partBad(partBad.length - 1) // noop keep
    val fctl2 = findChunk(partBad, "fcTL")
    partBad(fctl2 + 15) = (partBad(fctl2 + 15) - 1).toByte // width LSB
    reCrc(partBad, fctl2)
    val e2 = intercept[IllegalArgumentException](ApngCodec.decode(partBad))
    assert(e2.getMessage.contains("partial frame"))
    // acTL declares one more frame than the file carries
    val cntBad = good.clone()
    val actl = findChunk(cntBad, "acTL")
    assert(actl > 0)
    cntBad(actl + 11) = (cntBad(actl + 11) + 1).toByte
    reCrc(cntBad, actl)
    val e3 = intercept[IllegalArgumentException](ApngCodec.decode(cntBad))
    assert(e3.getMessage.contains("declares"))
    // a plain (non-animated) PNG has no acTL: decode must reject
    // rather than invent a single-frame animation
    val e4 = intercept[IllegalArgumentException](
      ApngCodec.decode(MediaGen.pngBytes(3L)))
    assert(e4.getMessage.contains("acTL"))
  }

  test("spec-valid layout with the default image EXCLUDED from the " +
    "animation (first fcTL after IDAT) decodes instead of rejecting") {
    // rearrange an encoded 2-frame APNG into the other spec-legal
    // layout: acTL(1), IDAT (default image only — not a frame),
    // fcTL(seq 0), fdAT(seq 1). The decoded animation is exactly the
    // one fdAT frame; the IDAT bytes are walked/CRC'd but dropped.
    val id = 4L // 2 + 4%4 = 2 frames
    val src = MediaGen.apngBytes(id)
    def chunks(b: Array[Byte]): Seq[(String, Int, Int)] = {
      var off = 8
      val out = Seq.newBuilder[(String, Int, Int)]
      while (off + 8 <= b.length) {
        val len = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
          ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
        out += ((new String(b, off + 4, 4, "US-ASCII"), off, 12 + len))
        off += 12 + len
      }
      out.result()
    }
    def reCrc(b: Array[Byte]): Unit = {
      val len = ((b(0) & 0xFF) << 24) | ((b(1) & 0xFF) << 16) |
        ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
      val crc = new java.util.zip.CRC32
      crc.update(b, 4, 4 + len)
      val v = crc.getValue
      b(8 + len) = ((v >>> 24) & 0xFF).toByte
      b(9 + len) = ((v >>> 16) & 0xFF).toByte
      b(10 + len) = ((v >>> 8) & 0xFF).toByte
      b(11 + len) = (v & 0xFF).toByte
    }
    val cs = chunks(src)
    assert(cs.count(_._1 == "fcTL") == 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(src, 0, 8)
    var fctlSeen = 0
    for ((t, off, tot) <- cs) {
      val c = java.util.Arrays.copyOfRange(src, off, off + tot)
      t match {
        case "acTL" =>
          // num_frames 2 -> 1: only the fdAT frame is animated
          c(8) = 0; c(9) = 0; c(10) = 0; c(11) = 1
          reCrc(c); out.write(c)
        case "fcTL" =>
          fctlSeen += 1
          if (fctlSeen == 2) {
            c(8) = 0; c(9) = 0; c(10) = 0; c(11) = 0 // seq 1 -> 0
            reCrc(c); out.write(c)
          } // first fcTL dropped: IDAT becomes the default image only
        case "fdAT" =>
          c(8) = 0; c(9) = 0; c(10) = 0; c(11) = 1 // seq 2 -> 1
          reCrc(c); out.write(c)
        case _ => out.write(c)
      }
    }
    val apng = ApngCodec.decode(out.toByteArray)
    assert((apng.width, apng.height) == MediaGen.apngDims(id))
    assert(apng.frames.length == 1)
    assert(apng.frames(0).toSeq == MediaGen.apngFramePixels(id, 1).toSeq)
  }
}
