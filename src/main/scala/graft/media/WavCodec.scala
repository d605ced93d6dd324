package graft.media

/** Minimal RIFF/WAVE PCM16 mono codec (public format, pure JVM) — the
  * audio twin of [[BmpCodec]]: a real byte-level decode path for the
  * multimodal pipeline without native audio libraries. The decoder
  * WALKS the chunk list (a real-world WAV often carries LIST/fact
  * chunks before `data`), so it parses the container, not a fixed
  * 44-byte offset.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, samples: Array[Short])

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

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode mono PCM16 at the given rate into a canonical 44-byte-header
    * WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = 2 * samples.length
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16) // PCM fmt chunk body size
    putU16(out, 20, 1) // PCM
    putU16(out, 22, 1) // mono
    putU32(out, 24, sampleRate)
    putU32(out, 28, sampleRate * 2) // byte rate
    putU16(out, 32, 2) // block align
    putU16(out, 34, 16) // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Decode by walking RIFF chunks until `data`; rejects non-PCM,
    * non-mono, non-16-bit payloads explicitly. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a WAV payload")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && samples == null) {
      val id = tag(bytes, off)
      val sz = getS32(bytes, off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          require(getU16(bytes, off + 8) == 1, "non-PCM WAV unsupported")
          require(getU16(bytes, off + 10) == 1, "stereo WAV unsupported")
          require(getU16(bytes, off + 22) == 16,
            s"bits/sample ${getU16(bytes, off + 22)} unsupported")
          sampleRate = getS32(bytes, off + 12)
        case "data" =>
          require(sampleRate > 0, "WAV data chunk before fmt chunk")
          val n = sz / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = getU16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
          samples = s
        case _ => // LIST/fact/etc: skip (chunks are word-aligned)
      }
      off += 8 + sz + (sz & 1)
    }
    require(samples != null, "WAV has no data chunk")
    Wav(sampleRate, samples)
  }
}
