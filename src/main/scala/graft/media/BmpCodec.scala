package graft.media

/** Minimal 24-bit uncompressed BMP codec (Windows BITMAPINFOHEADER —
  * the format is fully public and trivially parseable, which makes it
  * the honest choice for exercising a REAL image decode path with zero
  * native image libraries: 14-byte file header, 40-byte DIB header,
  * bottom-up BGR pixel rows padded to 4-byte boundaries).
  *
  * Pixels travel as a flat row-major TOP-DOWN Array[Int] of RGB
  * triplets (index 3*(y*w+x)+c, c = 0 r / 1 g / 2 b, values 0..255) —
  * the natural order for feature math; the codec owns the bottom-up
  * flip and row padding, and the decoder re-derives them from the
  * actual byte layout (so a round-trip genuinely validates the
  * format, not a memcpy).
  */
object BmpCodec {

  private val fileHeaderLen = 14
  private val dibHeaderLen = 40
  val pixelOffset: Int = fileHeaderLen + dibHeaderLen

  /** Padded byte width of one stored pixel row. */
  def rowSize(width: Int): Int = (3 * width + 3) / 4 * 4

  /** Total encoded size for a width×height image. */
  def encodedSize(width: Int, height: Int): Int =
    pixelOffset + height * rowSize(width)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def getU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def getS32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Encode top-down RGB triplets into a standard bottom-up 24bpp BMP. */
  def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"expected ${3 * width * height} channel values, got ${rgb.length}")
    val rs = rowSize(width)
    val out = new Array[Byte](encodedSize(width, height))
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length)
    putU32(out, 10, pixelOffset)
    putU32(out, 14, dibHeaderLen)
    putU32(out, 18, width)
    putU32(out, 22, height) // positive height = bottom-up rows
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bits per pixel
    putU32(out, 30, 0) // BI_RGB, uncompressed
    putU32(out, 34, height * rs)
    putU32(out, 38, 2835) // 72 dpi
    putU32(out, 42, 2835)
    var y = 0
    while (y < height) {
      val rowOff = pixelOffset + (height - 1 - y) * rs
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        out(rowOff + 3 * x) = (rgb(p + 2) & 0xFF).toByte // B
        out(rowOff + 3 * x + 1) = (rgb(p + 1) & 0xFF).toByte // G
        out(rowOff + 3 * x + 2) = (rgb(p) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24bpp uncompressed BMP into (width, height, top-down RGB
    * triplets). Rejects anything outside the supported profile with a
    * descriptive error (never a silent garbage read). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= pixelOffset && bytes(0) == 'B' &&
      bytes(1) == 'M', "not a BMP payload")
    val off = getS32(bytes, 10)
    val width = getS32(bytes, 18)
    val height = getS32(bytes, 22)
    require(width > 0 && height > 0,
      s"unsupported BMP geometry ${width}x$height (top-down BMPs " +
        "store negative height; this profile is bottom-up only)")
    require(getU16(bytes, 28) == 24,
      s"unsupported bpp ${getU16(bytes, 28)} (24bpp profile)")
    require(getS32(bytes, 30) == 0, "compressed BMP unsupported")
    val rs = rowSize(width)
    require(bytes.length >= off + height * rs, "truncated BMP payload")
    val rgb = new Array[Int](3 * width * height)
    var y = 0
    while (y < height) {
      val rowOff = off + (height - 1 - y) * rs
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        rgb(p) = bytes(rowOff + 3 * x + 2) & 0xFF
        rgb(p + 1) = bytes(rowOff + 3 * x + 1) & 0xFF
        rgb(p + 2) = bytes(rowOff + 3 * x) & 0xFF
        x += 1
      }
      y += 1
    }
    (width, height, rgb)
  }

  /** Nearest-neighbor resample: output pixel (x2, y2) takes source
    * pixel (⌊x2·w/w2⌋, ⌊y2·h/h2⌋) — the integer-floor mapping, so the
    * result is exactly reproducible by any engine (no kernel weights,
    * no float sampling positions). */
  def resizeNearest(
      width: Int, height: Int, rgb: Array[Int],
      outW: Int, outH: Int): Array[Int] = {
    require(outW > 0 && outH > 0)
    val out = new Array[Int](3 * outW * outH)
    var y2 = 0
    while (y2 < outH) {
      val sy = y2 * height / outH
      var x2 = 0
      while (x2 < outW) {
        val sx = x2 * width / outW
        val sp = 3 * (sy * width + sx)
        val dp = 3 * (y2 * outW + x2)
        out(dp) = rgb(sp); out(dp + 1) = rgb(sp + 1)
        out(dp + 2) = rgb(sp + 2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }
}
