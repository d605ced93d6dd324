package graft.media

import java.util.zip.CRC32

/** Minimal but REAL APNG (animated PNG) codec — the animated-frame
  * container that retires the video-frame decode stub: APNG is fully
  * public (originally the Mozilla extension, now folded into the PNG
  * spec's third edition) and, unlike actual video codecs, decodable
  * with zero native libraries because every frame is PNG image data
  * (zlib + scanline filters — the [[PngCodec]] halves are reused
  * verbatim).
  *
  * Container walk implemented:
  *   - `acTL` (animation control): num_frames + num_plays; must appear
  *     before the first IDAT per spec.
  *   - `fcTL` (frame control): sequence number, frame dims/offsets,
  *     delay fraction, dispose/blend ops. One precedes each frame's
  *     data; an fcTL before IDAT makes the IDAT stream frame 0, and
  *     when the first fcTL appears only AFTER IDAT the default image
  *     is (per spec) not part of the animation — its bytes are still
  *     walked and CRC-verified but excluded from the frame list.
  *   - `fdAT` (frame data): sequence number + IDAT-equivalent bytes.
  *     Consecutive fdAT chunks of one frame concatenate into that
  *     frame's OWN complete zlib stream (each frame compresses
  *     independently per spec — this is what makes sampled decoding
  *     cheap: skipped frames are never inflated).
  *
  * Sequence numbers are validated to be exactly 0..N-1 over fcTL+fdAT
  * in file order (the spec's ordering rule); CRC verifies on every
  * chunk via the shared walk discipline.
  *
  * Scope guards (reject, never garbage-decode): full-frame fcTL only
  * (offset 0,0 and frame dims == image dims — compositing partial
  * frames over a canvas with dispose/blend semantics is out of scope,
  * and rejecting beats silently flattening), 8-bit RGB base image,
  * frame count in acTL must match the fcTL count.
  */
object ApngCodec {

  /** Decoded animation: dims + per-frame flat top-down RGB arrays +
    * per-frame display delays in ms, read from each frame's fcTL
    * (delay_num/delay_den, den 0 ≡ 100 per the APNG spec) — duration
    * comes from the DECODE, never an assumed frame rate (r11 review).
    * `decode` inflates every frame; [[decodeSampled]] only the
    * selected ones. */
  final case class Apng(
      width: Int, height: Int, frames: Array[Array[Int]],
      delaysMs: Array[Long])

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xFF).toByte
    b(off + 1) = ((v >>> 16) & 0xFF).toByte
    b(off + 2) = ((v >>> 8) & 0xFF).toByte
    b(off + 3) = (v & 0xFF).toByte
  }

  private def getU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  /** Encode full-frame RGB frames as an APNG: IHDR + acTL, then per
    * frame an fcTL and the frame's own zlib stream (IDAT for frame 0,
    * fdAT after). Every frame runs through the same filter cycle as
    * the still encoder, so all five filters are exercised per frame. */
  def encode(width: Int, height: Int, frames: Array[Array[Int]])
      : Array[Byte] = {
    require(frames.nonEmpty, "APNG needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngCodec.pngSignature)
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width)
    putU32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    out.write(PngCodec.makeChunk("IHDR", ihdr))
    val actl = new Array[Byte](8)
    putU32(actl, 0, frames.length)
    putU32(actl, 4, 0) // num_plays: 0 = loop forever
    out.write(PngCodec.makeChunk("acTL", actl))
    var seq = 0
    for (f <- frames.indices) {
      val fctl = new Array[Byte](26)
      putU32(fctl, 0, seq); seq += 1
      putU32(fctl, 4, width)
      putU32(fctl, 8, height)
      putU32(fctl, 12, 0) // x_offset
      putU32(fctl, 16, 0) // y_offset
      // delay = delay_num/delay_den s, both u16 big-endian per the
      // APNG spec: 1/10 s = 10 fps
      fctl(20) = 0; fctl(21) = 1 // delay_num = 1
      fctl(22) = 0; fctl(23) = 10 // delay_den = 10
      fctl(24) = 0 // dispose_op: none
      fctl(25) = 0 // blend_op: source
      out.write(PngCodec.makeChunk("fcTL", fctl))
      val z = PngCodec.filterAndDeflate(width, height, frames(f))
      if (f == 0) out.write(PngCodec.makeChunk("IDAT", z))
      else {
        val fdat = new Array[Byte](4 + z.length)
        putU32(fdat, 0, seq); seq += 1
        System.arraycopy(z, 0, fdat, 4, z.length)
        out.write(PngCodec.makeChunk("fdAT", fdat))
      }
    }
    out.write(PngCodec.makeChunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** The container walk: validates framing/CRC/sequence and returns
    * (width, height, per-frame compressed zlib streams) WITHOUT
    * inflating any pixel data. */
  private def walk(bytes: Array[Byte])
      : (Int, Int, Array[Array[Byte]], Array[Long]) = {
    require(bytes.length >= 8 + 25,
      s"truncated APNG: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require(bytes(i) == PngCodec.pngSignature(i),
        f"bad PNG signature at byte $i: 0x${bytes(i) & 0xFF}%02x")
      i += 1
    }
    var off = 8
    var width = -1
    var height = -1
    var declared = -1
    var sawEnd = false
    var sawIdat = false
    var idatIsFrame0 = false
    var expectSeq = 0
    // per-frame compressed streams; fcTL opens a frame, IDAT/fdAT
    // bytes append to the OPEN frame
    val streams = scala.collection.mutable.ArrayBuffer
      .empty[java.io.ByteArrayOutputStream]
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (!sawEnd) {
      require(off + 12 <= bytes.length,
        s"truncated APNG: chunk header past end at offset $off")
      val len = getU32(bytes, off).toInt
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated APNG: chunk of $len bytes past end at offset $off")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue == getU32(bytes, off + 8 + len),
        s"APNG CRC mismatch in $typ chunk at offset $off")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = getU32(bytes, off + 8).toInt
          height = getU32(bytes, off + 12).toInt
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
          val bitDepth = bytes(off + 16) & 0xFF
          val colorType = bytes(off + 17) & 0xFF
          require(bitDepth == 8 && colorType == 2,
            s"unsupported APNG: bitDepth=$bitDepth colorType=$colorType " +
              "(only 8-bit truecolor RGB is in scope)")
        case "acTL" =>
          require(len == 8, s"acTL length $len")
          require(!sawIdat, "acTL after IDAT violates the APNG spec")
          declared = getU32(bytes, off + 8).toInt
          require(declared > 0, s"acTL declares $declared frames")
        case "fcTL" =>
          require(len == 26, s"fcTL length $len")
          val seq = getU32(bytes, off + 8).toInt
          require(seq == expectSeq,
            s"APNG sequence break: fcTL #$seq, expected #$expectSeq")
          expectSeq += 1
          val fw = getU32(bytes, off + 12).toInt
          val fh = getU32(bytes, off + 16).toInt
          val fx = getU32(bytes, off + 20).toInt
          val fy = getU32(bytes, off + 24).toInt
          require(fw == width && fh == height && fx == 0 && fy == 0,
            s"unsupported APNG: partial frame ${fw}x$fh+$fx+$fy " +
              "(compositing with dispose/blend is out of scope)")
          // an fcTL BEFORE the image data makes the IDAT stream frame
          // 0; if the first fcTL appears only after IDAT, the spec
          // says the default image is simply NOT part of the animation
          if (!sawIdat && streams.isEmpty) idatIsFrame0 = true
          streams += new java.io.ByteArrayOutputStream()
          // delay = delay_num/delay_den s (u16 big-endian each);
          // den 0 is to be treated as 100 per the APNG spec
          val num = ((bytes(off + 28) & 0xFF) << 8) |
            (bytes(off + 29) & 0xFF)
          val den0 = ((bytes(off + 30) & 0xFF) << 8) |
            (bytes(off + 31) & 0xFF)
          val den = if (den0 == 0) 100 else den0
          delays += num.toLong * 1000L / den
        case "IDAT" =>
          sawIdat = true
          require(declared >= 0 || streams.nonEmpty,
            "not an APNG: IDAT with no acTL/fcTL (plain PNG — " +
              "use PngCodec)")
          // when the default image is excluded from the animation
          // (no fcTL preceded IDAT), its bytes are walked (CRC'd)
          // but never appended to any frame stream
          if (idatIsFrame0) streams.head.write(bytes, off + 8, len)
        case "fdAT" =>
          require(len >= 4, s"fdAT length $len")
          val seq = getU32(bytes, off + 8).toInt
          require(seq == expectSeq,
            s"APNG sequence break: fdAT #$seq, expected #$expectSeq")
          expectSeq += 1
          require(streams.nonEmpty, "fdAT before any fcTL")
          streams.last.write(bytes, off + 12, len - 4)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len
    }
    require(width > 0, "APNG has no IHDR")
    require(declared >= 0, "not an APNG: no acTL chunk")
    require(streams.length == declared,
      s"acTL declares $declared frames, found ${streams.length} fcTL")
    (width, height, streams.map(_.toByteArray).toArray,
      delays.toArray)
  }

  /** Decode every frame. */
  def decode(bytes: Array[Byte]): Apng = {
    val (w, h, streams, delays) = walk(bytes)
    Apng(w, h, streams.map(PngCodec.inflateAndUnfilter(w, h, _)),
      delays)
  }

  /** Frame-sampled decode — the keyframe-extraction shape: the
    * container walk touches every chunk (framing + CRC + sequence
    * stay fully validated), but only frames selected by `keep(idx,
    * nFrames)` are INFLATED and unfiltered. Returns (frame_idx, rgb)
    * pairs plus the total frame count. At 100 TB the inflate is the
    * dominant per-byte cost, so sampling every k-th frame divides the
    * decode bill by k — exactly like a video pipeline that seeks to
    * keyframes instead of decoding the whole stream. */
  def decodeSampled(bytes: Array[Byte], keep: (Int, Int) => Boolean)
      : (Int, Int, Int, Seq[(Int, Array[Int])], Array[Long]) = {
    val (w, h, streams, delays) = walk(bytes)
    val n = streams.length
    val sampled = streams.zipWithIndex.collect {
      case (z, idx) if keep(idx, n) =>
        idx -> PngCodec.inflateAndUnfilter(w, h, z)
    }
    (w, h, n, sampled.toSeq, delays)
  }
}
