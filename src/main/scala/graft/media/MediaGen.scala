package graft.media

/** Deterministic media fixture generator: the testdata ships no binary
  * column (SURVEY §2.9), so image/audio payloads are synthesized from
  * `doc_id` alone via CLOSED-FORM integer formulas. That choice is what
  * makes the decode queries ORACLE-CHECKABLE end-to-end: DuckDB
  * recomputes the expected pixel/sample statistics from the same
  * formulas over `range()`, while the engine path actually ENCODES the
  * bytes and then PARSES them back through the real codecs — any bug in
  * either direction of the byte layout (row padding, bottom-up flip,
  * chunk walk, endianness) breaks the hash match.
  *
  * Formulas (mirrored verbatim in the oracle SQL of q_image_decode /
  * q_image_resize / q_audio_stats):
  *   width  = 8 + doc_id % 9          (8..16 — exercises row padding)
  *   height = 8 + (doc_id / 3) % 7    (8..14)
  *   rgb[j] = (doc_id * 31 + j) % 256, j in [0, 3·w·h)
  *   rate   = 8000 + (doc_id % 5) * 2000
  *   n      = 200 + doc_id % 300
  *   s[j]   = (doc_id * 7 + j * 13) % 65536 − 32768
  */
object MediaGen {

  def imageDims(docId: Long): (Int, Int) =
    ((8 + docId % 9).toInt, (8 + (docId / 3) % 7).toInt)

  def imagePixels(docId: Long): Array[Int] = {
    val (w, h) = imageDims(docId)
    Array.tabulate(3 * w * h)(j => ((docId * 31 + j) % 256).toInt)
  }

  def imageBytes(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    BmpCodec.encode(w, h, imagePixels(docId))
  }

  def wavRate(docId: Long): Int = (8000 + (docId % 5) * 2000).toInt

  def wavSamples(docId: Long): Array[Short] = {
    val n = (200 + docId % 300).toInt
    Array.tabulate(n)(j => ((docId * 7 + j * 13) % 65536 - 32768).toShort)
  }

  def wavBytes(docId: Long): Array[Byte] =
    WavCodec.encode(wavRate(docId), wavSamples(docId))

  // Animated-GIF fixtures (q_gif_frames):
  //   w        = 8 + doc_id % 5            (8..12)
  //   h        = 6 + (doc_id / 2) % 5      (6..10)
  //   n_frames = 3 + doc_id % 4            (3..6)
  //   idx[f][j] = (doc_id·7 + f·11 + j·5) % 16   (palette index)
  // palette formulas live in GifCodec.paletteColor.

  def gifDims(docId: Long): (Int, Int) =
    ((8 + docId % 5).toInt, (6 + (docId / 2) % 5).toInt)

  def gifFrameCount(docId: Long): Int = (3 + docId % 4).toInt

  def gifFrameIndices(docId: Long, f: Int): Array[Byte] = {
    val (w, h) = gifDims(docId)
    Array.tabulate(w * h)(j =>
      ((docId * 7 + f * 11 + j * 5) % 16).toByte)
  }

  def gifBytes(docId: Long): Array[Byte] = {
    val (w, h) = gifDims(docId)
    GifCodec.encode(w, h,
      Array.tabulate(gifFrameCount(docId))(f => gifFrameIndices(docId, f)))
  }

  // PNG fixtures (q_png_decode):
  //   w      = 5 + doc_id % 8           (5..12)
  //   h      = 5 + (doc_id / 2) % 7     (5..11 — ≥5 rows, so every
  //            image exercises all five scanline filters)
  //   rgb[j] = (doc_id * 17 + j * 3) % 256

  def pngDims(docId: Long): (Int, Int) =
    ((5 + docId % 8).toInt, (5 + (docId / 2) % 7).toInt)

  def pngPixels(docId: Long): Array[Int] = {
    val (w, h) = pngDims(docId)
    Array.tabulate(3 * w * h)(j => ((docId * 17 + j * 3) % 256).toInt)
  }

  def pngBytes(docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    PngCodec.encode(w, h, pngPixels(docId))
  }

  // APNG fixtures (q_apng_frames):
  //   w        = 7 + doc_id % 6        (7..12)
  //   h        = 5 + (doc_id / 2) % 6  (5..10 — ≥5 rows, all filters)
  //   n_frames = 2 + doc_id % 4        (2..5)
  //   rgb[f][j] = (doc_id * 13 + f * 19 + j * 7) % 256

  def apngDims(docId: Long): (Int, Int) =
    ((7 + docId % 6).toInt, (5 + (docId / 2) % 6).toInt)

  def apngFrameCount(docId: Long): Int = (2 + docId % 4).toInt

  def apngFramePixels(docId: Long, f: Int): Array[Int] = {
    val (w, h) = apngDims(docId)
    Array.tabulate(3 * w * h)(j =>
      ((docId * 13 + f * 19 + j * 7) % 256).toInt)
  }

  def apngBytes(docId: Long): Array[Byte] = {
    val (w, h) = apngDims(docId)
    ApngCodec.encode(w, h,
      Array.tabulate(apngFrameCount(docId))(f => apngFramePixels(docId, f)))
  }
}
