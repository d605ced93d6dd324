package graft.media

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM GIF89a codec (public format: W3C GIF89a specification) —
  * the real MULTI-FRAME container of the media tier: an animated GIF
  * is a sequence of palette-indexed frames behind real LZW compression,
  * which makes frame-sampling a genuine decode path rather than a stub
  * (Multimodal.qGifFrames samples and decodes frames through this).
  *
  * Scope (documented, spec-guarded): GIF89a, one global 16-color
  * table, full frames (no sub-rectangles), no interlace, no
  * transparency — rejected explicitly, never misparsed. The LZW is the
  * REAL variable-width algorithm both directions: dictionary growth to
  * 12-bit codes, CLEAR reset at 4096, the KwKwK self-reference case,
  * deferred-clear tolerance, LSB-first bit packing, 255-byte sub-block
  * framing.
  */
object GifCodec {

  val PaletteBits = 4 // 16-color global table
  val PaletteSize = 1 << PaletteBits

  /** Deterministic palette entry c → (r, g, b). */
  def paletteColor(c: Int): (Int, Int, Int) =
    ((c * 17 + 3) % 256, (c * 29 + 7) % 256, (c * 43 + 11) % 256)

  private def putU16(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += (v & 0xff).toByte
    b += ((v >> 8) & 0xff).toByte
  }

  // ---------------------------------------------------------------
  // LZW (GIF variant): variable code width, CLEAR/EOI, 12-bit cap
  // ---------------------------------------------------------------

  /** Encode palette indices with real GIF-LZW at `minCode` bits. */
  def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = ArrayBuffer.empty[Byte]
    var cur = 0L
    var curBits = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += codeSize
      while (curBits >= 8) {
        out += (cur & 0xff).toByte
        cur >>= 8
        curBits -= 8
      }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    def reset(): Unit = { dict = new java.util.HashMap(); next = eoi + 1 }
    emit(clear)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val key = (prefix.toLong << 12) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          if (next < 4096) {
            dict.put(key, next)
            // GIF increments the code width when the NEXT code to be
            // assigned no longer fits the current width
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
            next += 1
          } else {
            emit(clear)
            codeSize = minCode + 1
            reset()
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (curBits > 0) out += (cur & 0xff).toByte
    out.toArray
  }

  /** Decode a GIF-LZW stream back to palette indices. */
  def lzwDecode(data: Array[Byte], minCode: Int, expected: Int)
      : Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefixes = new Array[Int](4096)
    val suffixes = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = minCode + 1
    val out = new ArrayBuffer[Byte](expected)
    var cur = 0L
    var curBits = 0
    var pos = 0
    def read(): Int = {
      while (curBits < codeSize && pos < data.length) {
        cur |= (data(pos) & 0xffL) << curBits
        curBits += 8
        pos += 1
      }
      if (curBits < codeSize) -1
      else {
        val c = (cur & ((1L << codeSize) - 1)).toInt
        cur >>= codeSize
        curBits -= codeSize
        c
      }
    }
    def expand(code: Int): Array[Byte] = {
      val stack = new ArrayBuffer[Byte](8)
      var c = code
      while (c >= eoi + 1) { stack += suffixes(c); c = prefixes(c) }
      stack += c.toByte
      stack.reverseIterator.toArray
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) {
        next = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else {
        val entry: Array[Byte] =
          if (code < clear) Array(code.toByte)
          else if (code < next) expand(code)
          else if (code == next && prev >= 0) {
            // KwKwK: the just-referenced string plus its own first byte
            val p = expand(prev)
            p :+ p(0)
          } else
            throw new IllegalArgumentException(
              s"gif: LZW code $code beyond dictionary ($next)")
        out ++= entry
        if (prev >= 0 && next < 4096) {
          prefixes(next) = prev
          suffixes(next) = entry(0)
          next += 1
          // width grows when the next assignable code outgrows it;
          // at 4096 GIF defers until an explicit CLEAR
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(out.length == expected,
      s"gif: decoded ${out.length} pixels, expected $expected")
    out.toArray
  }

  // ---------------------------------------------------------------
  // Container
  // ---------------------------------------------------------------

  /** Encode full-size frames of palette indices as an animated
    * GIF89a with the deterministic global 16-color table, one uniform
    * per-frame delay. */
  def encode(
      width: Int, height: Int, frames: Array[Array[Byte]],
      delayCs: Int = 10): Array[Byte] =
    encode(width, height, frames, Array.fill(frames.length)(delayCs))

  /** Per-frame-delay variant (r12 advice): resize/decimation paths
    * re-encode frames KEEPING each frame's decoded delay, so the
    * payload's real duration equals the reported metadata even for
    * variable-delay GIFs — the uniform-delay overload silently
    * stamped every frame with frame 0's delay. */
  def encode(
      width: Int, height: Int, frames: Array[Array[Byte]],
      delaysCs: Array[Int]): Array[Byte] = {
    require(frames.nonEmpty, "gif: at least one frame")
    require(delaysCs.length == frames.length,
      s"gif: ${delaysCs.length} delays for ${frames.length} frames")
    frames.foreach(f => require(f.length == width * height,
      "gif: frame pixel count must be width*height"))
    val out = ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    putU16(out, width)
    putU16(out, height)
    // global color table flag, 8-bit color resolution, size 2^(3+1)=16
    out += (0x80 | 0x70 | (PaletteBits - 1)).toByte
    out += 0 // background color index
    out += 0 // aspect
    for (c <- 0 until PaletteSize) {
      val (r, g, b) = paletteColor(c)
      out += r.toByte; out += g.toByte; out += b.toByte
    }
    for ((f, fi) <- frames.zipWithIndex) {
      // graphic control extension (delay only; no transparency)
      out += 0x21.toByte; out += 0xf9.toByte; out += 4
      out += 0 // packed: no disposal, no transparency
      putU16(out, delaysCs(fi))
      out += 0 // transparent color index (unused)
      out += 0 // terminator
      // image descriptor: full frame, no local table, no interlace
      out += 0x2c.toByte
      putU16(out, 0); putU16(out, 0)
      putU16(out, width); putU16(out, height)
      out += 0
      out += PaletteBits.toByte // LZW minimum code size
      val lzw = lzwEncode(f, PaletteBits)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out += n.toByte
        out ++= lzw.slice(off, off + n)
        off += n
      }
      out += 0 // block terminator
    }
    out += 0x3b.toByte
    out.toArray
  }

  /** Decoded animation. `delaysCs` = per-frame display delay in
    * CENTISECONDS from each frame's Graphic Control Extension (0 when
    * a frame has no GCE) — duration is decode-derived, never an
    * assumed frame rate. */
  final case class Gif(
      width: Int, height: Int,
      palette: Array[(Int, Int, Int)],
      frames: Array[Array[Byte]],
      delaysCs: Array[Int])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Decode an animated GIF89a within the documented scope. */
  def decode(bytes: Array[Byte]): Gif = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII") == "GIF89a",
      "gif: not a GIF89a stream")
    val width = u16(bytes, 6)
    val height = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "gif: global color table required")
    val gctSize = 1 << ((packed & 0x07) + 1)
    var pos = 13
    val palette = Array.tabulate(gctSize) { c =>
      val p = pos + 3 * c
      ((bytes(p) & 0xff, bytes(p + 1) & 0xff, bytes(p + 2) & 0xff))
    }
    pos += 3 * gctSize
    val frames = ArrayBuffer.empty[Array[Byte]]
    val delays = ArrayBuffer.empty[Int]
    // the GCE (extension label 0xF9) preceding an image descriptor
    // carries that frame's delay in centiseconds
    var pendingDelayCs = 0
    var done = false
    // a truncated stream (missing trailer, sub-block length past the
    // buffer) must reject with a DIAGNOSTIC, not a raw
    // ArrayIndexOutOfBounds — the codec's contract is "rejected
    // explicitly, never misparsed"
    try while (!done) {
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: capture a GCE delay, skip the rest
          if ((bytes(pos + 1) & 0xff) == 0xf9 &&
            (bytes(pos + 2) & 0xff) == 4)
            pendingDelayCs = u16(bytes, pos + 4)
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val left = u16(bytes, pos + 1)
          val top = u16(bytes, pos + 3)
          val w = u16(bytes, pos + 5)
          val h = u16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          require(left == 0 && top == 0 && w == width && h == height,
            "gif: sub-rectangle frames out of scope")
          require((ipacked & 0x80) == 0, "gif: local color tables out of scope")
          require((ipacked & 0x40) == 0, "gif: interlace out of scope")
          pos += 10
          val minCode = bytes(pos) & 0xff
          pos += 1
          val data = ArrayBuffer.empty[Byte]
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data ++= bytes.slice(pos + 1, pos + 1 + n)
            pos += 1 + n
          }
          pos += 1
          frames += lzwDecode(data.toArray, minCode, width * height)
          delays += pendingDelayCs
          pendingDelayCs = 0
        case other =>
          throw new IllegalArgumentException(
            f"gif: unexpected block 0x$other%02x at $pos")
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "gif: truncated stream (block data runs past the buffer)")
    }
    Gif(width, height, palette, frames.toArray, delays.toArray)
  }
}
