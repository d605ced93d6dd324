package graft.media

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal but REAL PNG codec for 8-bit truecolor (color type 2) —
  * the most common image format, fully public (RFC 2083 / ISO 15948),
  * and decodable with zero native libraries because the JDK ships the
  * zlib half (`java.util.zip`). What makes this a genuine decode path
  * rather than a memcpy:
  *
  *   - chunk framing with CRC-32 verification on every chunk (a
  *     flipped payload byte is detected, not silently decoded);
  *   - zlib inflate of the IDAT stream, reassembled across MULTIPLE
  *     IDAT chunks (the spec allows any split; real encoders use it);
  *   - per-scanline UNFILTERING of all five standard filters (None /
  *     Sub / Up / Average / Paeth) — the encoder cycles through all
  *     five by row, so every fixture image exercises every filter and
  *     the Paeth predictor in both directions.
  *
  * Scope guards (reject, never garbage-decode): 8-bit RGB only, no
  * interlace, no palette/alpha/gray color types, signature and CRC
  * must verify, truncated streams fail with a diagnostic.
  *
  * Pixels travel as the same flat top-down RGB Array[Int] the BMP
  * codec uses (index 3*(y*w+x)+c).
  */
object PngCodec {

  private val signature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)

  private def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + payload.length)
    putU32(out, 0, payload.length)
    var i = 0
    while (i < 4) { out(4 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 8, payload.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + payload.length)
    putU32(out, 8 + payload.length, crc.getValue.toInt)
    out
  }

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xFF).toByte
    b(off + 1) = ((v >>> 16) & 0xFF).toByte
    b(off + 2) = ((v >>> 8) & 0xFF).toByte
    b(off + 3) = (v & 0xFF).toByte
  }

  private def getU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Scanline-filter `rgb` (filter type = y % 5, so every image taller
    * than 4 rows exercises every filter) and deflate to a complete
    * zlib stream — the shared image-data half of the encoder, reused
    * verbatim by [[ApngCodec]] for per-frame fdAT payloads (the APNG
    * spec gives each frame its own zlib datastream with IDAT-identical
    * content). */
  private[media] def filterAndDeflate(
      width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"expected ${3 * width * height} channel values, got ${rgb.length}")
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var i = 0
      while (i < stride) { cur(i) = rgb(y * stride + i) & 0xFF; i += 1 }
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (y > 0 && i >= 3) prev(i - 3) else 0
        val v = f match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case 4 => cur(i) - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = (v & 0xFF).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      bos.write(buf, 0, n)
    }
    deflater.end()
    bos.toByteArray
  }

  /** Encode top-down RGB triplets as a single-IDAT 8-bit RGB PNG. */
  def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    val idat = filterAndDeflate(width, height, rgb)
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width)
    putU32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", idat))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Decoded image: dims + flat top-down RGB channel values. */
  final case class Png(width: Int, height: Int, rgb: Array[Int])

  def decode(bytes: Array[Byte]): Png = {
    require(bytes.length >= 8 + 25,
      s"truncated PNG: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require(bytes(i) == signature(i),
        f"bad PNG signature at byte $i: 0x${bytes(i) & 0xFF}%02x")
      i += 1
    }
    var off = 8
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(off + 12 <= bytes.length,
        s"truncated PNG: chunk header past end at offset $off")
      val len = getU32(bytes, off).toInt
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated PNG: chunk of $len bytes past end at offset $off")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue == getU32(bytes, off + 8 + len),
        s"PNG CRC mismatch in $typ chunk at offset $off")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = getU32(bytes, off + 8).toInt
          height = getU32(bytes, off + 12).toInt
          require(width > 0 && height > 0,
            s"bad dims ${width}x$height")
          val bitDepth = bytes(off + 16) & 0xFF
          val colorType = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          require(bitDepth == 8 && colorType == 2,
            s"unsupported PNG: bitDepth=$bitDepth colorType=$colorType " +
              "(only 8-bit truecolor RGB is in scope)")
          require(interlace == 0,
            "unsupported PNG: Adam7 interlace is out of scope")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len
    }
    require(width > 0, "PNG has no IHDR")
    Png(width, height, inflateAndUnfilter(width, height, idat.toByteArray))
  }

  /** Inflate a complete zlib image-data stream and invert the scanline
    * filters — the shared decode half, reused by [[ApngCodec]] on each
    * frame's reassembled fdAT stream. Rejects truncated streams, FDICT,
    * and streams that do not END at the declared pixel count. */
  private[media] def inflateAndUnfilter(
      width: Int, height: Int, zstream: Array[Byte]): Array[Int] = {
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(zstream)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      // zero progress without completion is ALWAYS terminal: truncated
      // stream (needsInput), or an out-of-scope zlib feature such as a
      // preset dictionary (needsDictionary) — either way, throwing here
      // is what keeps a malformed stream from spinning this loop
      if (n == 0 && !inflater.finished())
        throw new IllegalArgumentException(
          if (inflater.needsDictionary)
            "unsupported PNG: IDAT zlib stream requires a preset " +
              "dictionary (FDICT) — out of scope"
          else
            s"PNG IDAT stream ended prematurely: $got of ${raw.length}")
      got += n
    }
    require(got == raw.length,
      s"PNG IDAT inflated to $got bytes, expected ${raw.length}")
    // surplus check: the loop exits the moment `got` fills the buffer,
    // so a stream carrying MORE pixel data than IHDR declares would
    // otherwise decode as a silently truncated image. One probe inflate
    // must yield nothing and leave the stream finished.
    if (!inflater.finished()) {
      val extra = inflater.inflate(new Array[Byte](1))
      require(extra == 0 && inflater.finished(),
        s"PNG IDAT zlib stream does not end at the ${raw.length} bytes " +
          "IHDR declares (surplus pixel data, or missing final block)")
    }
    inflater.end()
    val rgb = new Array[Int](stride * height)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xFF
      require(f <= 4, s"bad PNG filter type $f on row $y")
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xFF
        val a = if (x >= 3) cur(x - 3) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (y > 0 && x >= 3) prev(x - 3) else 0
        cur(x) = f match {
          case 0 => v
          case 1 => (v + a) & 0xFF
          case 2 => (v + b) & 0xFF
          case 3 => (v + (a + b) / 2) & 0xFF
          case 4 => (v + paeth(a, b, c)) & 0xFF
        }
        rgb(y * stride + x) = cur(x)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    rgb
  }

  private[media] def makeChunk(typ: String, payload: Array[Byte])
      : Array[Byte] = chunk(typ, payload)

  private[media] val pngSignature: Array[Byte] = signature
}
