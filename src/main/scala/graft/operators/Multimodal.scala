package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QDef
import graft.sources.TableLoader._

/** Multimodal column support (SURVEY.md §2.9 "multimodal columns" +
  * §1.2 OLE Object → BinaryType; driver mandate).
  *
  * Media payloads are opaque `BinaryType` columns with a typed metadata
  * struct riding alongside. Two tiers:
  *
  *   - REAL codecs for public pure-JVM-parseable formats — 24bpp BMP,
  *     PCM16 WAV, animated GIF89a, PNG, and animated APNG
  *     ([[graft.media.BmpCodec]]/[[graft.media.WavCodec]]/
  *     [[graft.media.GifCodec]]/[[graft.media.PngCodec]]/
  *     [[graft.media.ApngCodec]], no native libs): the decode /
  *     resize / audio-stats / frame-sampling queries encode
  *     deterministic fixtures, parse the BYTES back, and are
  *     ORACLE-CHECKED against DuckDB recomputing the expected
  *     statistics from the generative formulas
  *     ([[graft.media.MediaGen]]) — the byte layout itself is under
  *     hash test. Animated frame decode is covered twice for real
  *     (palette frames via GIF, true-color frames via APNG with
  *     sampled-only inflation), so every media lane — still image,
  *     audio, animation/keyframe — has a genuine codec path.
  *   - A STUB decoder retained ONLY for the opaque-container batch
  *     shape (`decodeStub` in qMultimodalFeatures/qMultimodalFrames):
  *     it demonstrates the 1→N fan-out plumbing against a format the
  *     JVM genuinely cannot parse (e.g. H.264 video), where swapping
  *     in a native codec changes ONE function, not the pipeline.
  */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))),
      nullable = false)))

  val featureDim = 16

  /** STUB decode: a real implementation would decode the payload with a
    * codec and emit pixel/sample features. The deterministic fake folds
    * the bytes into `featureDim` accumulators (rolling polynomial hash
    * per lane) so the full pipeline — including partition-parallel
    * execution and downstream similarity — is exercised end-to-end.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](featureDim)
    var i = 0
    while (i < payload.length) {
      val lane = i % featureDim
      acc(lane) = acc(lane) * 31 + (payload(i) & 0xFF)
      i += 1
    }
    acc.map(v => Math.floorMod(v, 1000003L).toFloat / 1000003f)
  }

  /** Batch feature extraction: mapPartitions over the payload column —
    * the Scala analog of `mapInPandas` batch decode. Each partition
    * decodes its rows independently (no shuffle), which is exactly how
    * a 1000-executor cluster fans out codec work at 100 TB. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media
      .select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          org.apache.spark.sql.Row(
            r.getLong(0), r.getString(1),
            decodeStub(r.getAs[Array[Byte]](2)).toSeq)
        }
      }(enc)
  }

  /** Build a media table from documents: payload = utf8 bytes of text
    * (the fixtures ship no binary column — SURVEY §2.9), metadata
    * populated the way an ingest job would. */
  def mediaFromDocuments(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).cast("bigint").as("byte_len"),
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("bigint").as("duration_ms")).as("meta"))

  /** Binary-column metadata query: byte length + content hashes over
    * BinaryType payloads (md5/sha2 on binary are the Access OLE-column
    * operations). Oracle hashes the same bytes from the text column. */
  val qMultimodalMeta: QDef = QDef(
    "q_multimodal_meta",
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS payload_md5,
      |  sha256(text) AS payload_sha256
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    mediaFromDocuments(s, d)
      .select(
        col("media_id"),
        col("meta.byte_len").as("byte_len"),
        md5(col("payload")).as("payload_md5"),
        sha2(col("payload"), 256).as("payload_sha256"))
      .orderBy(col("media_id"))
  }

  /** Feature-extraction query over the stubbed decoder: per-kind count
    * and mean first-lane feature — exercises the full binary →
    * mapPartitions-decode → aggregate pipeline. No oracle (the stub is
    * engine-internal); MultimodalSpec pins exact values. */
  val qMultimodalFeatures: QDef = QDef.noOracle("q_multimodal_features") {
    (s, d) =>
      extractFeatures(mediaFromDocuments(s, d))
        .select(
          col("media_id"), col("kind"),
          element_at(col("features"), 1).cast("double").as("f0"),
          aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double"))
            .as("f_sum"))
        .orderBy(col("media_id"))
  }

  /** STUB resize: a real implementation would decode, scale with a
    * resampling kernel, and re-encode; the deterministic fake
    * stride-samples the payload down to `targetBytes` so the pipeline
    * shape — per-row binary in, smaller binary out, metadata updated,
    * partition-parallel, no shuffle — is exercised end-to-end. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        // evenly-spaced sample positions (nearest-neighbor downsample)
        out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
        i += 1
      }
      out
    }
  }

  /** Batch resize over the media table: payload replaced by its
    * downsampled form, `meta.byte_len` updated, all other metadata
    * preserved — the write-back shape a thumbnailing pass needs. */
  def resizeMedia(media: DataFrame, targetBytes: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    media
      .select(col("media_id"), col("kind"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val resized = resizeStub(r.getAs[Array[Byte]](2), targetBytes)
          val meta = r.getAs[org.apache.spark.sql.Row](3)
          org.apache.spark.sql.Row(
            r.getLong(0), r.getString(1), resized,
            org.apache.spark.sql.Row(
              resized.length.toLong, meta.getString(1),
              meta.get(2), meta.get(3), meta.get(4)))
        }
      }(enc)
  }

  /** Fake frame geometry for the video path: payloads are treated as a
    * concatenation of fixed-size frames (a real decoder would use the
    * container's index instead — same row shape out). */
  val frameBytes = 256

  /** Frame sampling: every `stride`-th frame of each video payload
    * becomes its OWN output row (frame_idx + per-frame features) — the
    * 1→N flatMap batch shape a real video pipeline needs, still
    * partition-parallel with no shuffle. Sampling happens BEFORE
    * decoding (only sampled frames are decoded) — at 100 TB the decode
    * is the cost, so stride-k cuts codec work k×, not just output. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            val frame = java.util.Arrays.copyOfRange(
              payload, f * frameBytes, (f + 1) * frameBytes)
            org.apache.spark.sql.Row(id, f, decodeStub(frame).toSeq)
          }
        }
      }(enc)
  }

  /** Frame-sample query (stride 4): one row per sampled frame with the
    * first feature lane. No oracle (stub decoder); MultimodalSpec pins
    * the sampling arithmetic and per-frame determinism. */
  val qMultimodalFrames: QDef = QDef.noOracle("q_multimodal_frames") {
    (s, d) =>
      sampleFrames(mediaFromDocuments(s, d), stride = 4)
        .select(
          col("media_id"), col("frame_idx"),
          element_at(col("features"), 1).cast("double").as("f0"))
        .orderBy(col("media_id"), col("frame_idx"))
  }

  // ---------------------------------------------------------------
  // Real-codec tier (BMP / WAV, oracle-checked end-to-end)
  // ---------------------------------------------------------------

  /** doc_id → real encoded BMP payload (deterministic MediaGen pixels).
    * Pure map-side: encode work fans out per partition exactly like a
    * production thumbnail/ingest job. */
  def imageTable(s: SparkSession, d: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        org.apache.spark.sql.Row(id, graft.media.MediaGen.imageBytes(id))
      }
    }(enc)
  }

  private val imageStatsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private def channelSums(rgb: Array[Int]): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < rgb.length) {
      sr += rgb(p); sg += rgb(p + 1); sb += rgb(p + 2)
      p += 3
    }
    (sr, sg, sb)
  }

  /** Real image decode: parse the BMP bytes (header geometry, bottom-up
    * row flip, row padding) and aggregate per-channel means. The oracle
    * recomputes the SAME statistics from MediaGen's closed-form pixel
    * formula over `range()` — so a mistake anywhere in encode OR decode
    * byte handling breaks the hash, not just a unit test. */
  val qImageDecode: QDef = QDef(
    "q_image_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS INT) AS width,
      |    CAST(8 + (doc_id // 3) % 7 AS INT) AS height
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, width, height,
      |    unnest(range(3 * width * height)) AS j
      |  FROM g),
      |p AS (
      |  SELECT doc_id, width, height, j,
      |    (doc_id * 31 + j) % 256 AS val
      |  FROM v)
      |SELECT doc_id, width, height,
      |  CAST(54 + height * ((3 * width + 3) // 4 * 4) AS BIGINT)
      |    AS byte_len,
      |  ROUND(SUM(CASE WHEN j % 3 = 0 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_r,
      |  ROUND(SUM(CASE WHEN j % 3 = 1 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_g,
      |  ROUND(SUM(CASE WHEN j % 3 = 2 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_b
      |FROM p
      |GROUP BY doc_id, width, height
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imageStatsSchema)
    imageTable(s, d).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, rgb) = graft.media.BmpCodec.decode(bytes)
        val (sr, sg, sb) = channelSums(rgb)
        org.apache.spark.sql.Row(
          r.getLong(0), w, h, bytes.length.toLong, sr, sg, sb)
      }
    }(enc)
      .select(
        col("doc_id"), col("width"), col("height"), col("byte_len"),
        round(col("sum_r") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_r"),
        round(col("sum_g") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_g"),
        round(col("sum_b") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_b"))
      .orderBy(col("doc_id"))
  }

  /** Real thumbnail pass: decode → nearest-neighbor resize to 8×8 →
    * RE-ENCODE → decode the thumbnail again → per-channel means. The
    * oracle maps each output pixel to its integer-floor source position
    * and evaluates the pixel formula there, so the resample geometry
    * (⌊x2·w/8⌋, ⌊y2·h/8⌋) is hash-pinned too. */
  val qImageResize: QDef = QDef(
    "q_image_resize",
    """WITH g AS (
      |  SELECT doc_id,
      |    8 + doc_id % 9 AS w,
      |    8 + (doc_id // 3) % 7 AS h
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, w, h, unnest(range(64)) AS p
      |  FROM g),
      |m AS (
      |  SELECT doc_id,
      |    ((p // 8) * h // 8) * w + ((p % 8) * w // 8) AS src_pix
      |  FROM o)
      |SELECT doc_id,
      |  ROUND(SUM((doc_id * 31 + 3 * src_pix) % 256) * 1.0 / 64, 4)
      |    AS mean_r,
      |  ROUND(SUM((doc_id * 31 + 3 * src_pix + 1) % 256) * 1.0 / 64, 4)
      |    AS mean_g,
      |  ROUND(SUM((doc_id * 31 + 3 * src_pix + 2) % 256) * 1.0 / 64, 4)
      |    AS mean_b
      |FROM m
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    imageTable(s, d).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = graft.media.BmpCodec.decode(r.getAs[Array[Byte]](1))
        val thumb = graft.media.BmpCodec.encode(8, 8,
          graft.media.BmpCodec.resizeNearest(w, h, rgb, 8, 8))
        val (_, _, rgb2) = graft.media.BmpCodec.decode(thumb)
        val (sr, sg, sb) = channelSums(rgb2)
        org.apache.spark.sql.Row(r.getLong(0), sr, sg, sb)
      }
    }(enc)
      .select(
        col("doc_id"),
        round(col("sum_r") * lit(1.0) / 64, 4).as("mean_r"),
        round(col("sum_g") * lit(1.0) / 64, 4).as("mean_g"),
        round(col("sum_b") * lit(1.0) / 64, 4).as("mean_b"))
      .orderBy(col("doc_id"))
  }

  /** Real audio decode: encode deterministic PCM16 WAVs, walk the RIFF
    * chunk list back off the bytes, and report rate / duration / RMS /
    * peak — oracle-checked against the closed-form sample formula. */
  val qAudioStats: QDef = QDef(
    "q_audio_stats",
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(8000 + (doc_id % 5) * 2000 AS INT) AS sample_rate,
      |    CAST(200 + doc_id % 300 AS INT) AS n_samples
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, sample_rate, n_samples,
      |    unnest(range(n_samples)) AS j
      |  FROM g),
      |p AS (
      |  SELECT doc_id, sample_rate, n_samples,
      |    (doc_id * 7 + j * 13) % 65536 - 32768 AS s
      |  FROM v)
      |SELECT doc_id, sample_rate, n_samples,
      |  CAST(44 + 2 * n_samples AS BIGINT) AS byte_len,
      |  CAST(FLOOR(n_samples * 1000.0 / sample_rate) AS BIGINT)
      |    AS duration_ms,
      |  ROUND(SQRT(SUM(s * s) * 1.0 / n_samples), 4) AS rms,
      |  CAST(MAX(ABS(s)) AS BIGINT) AS peak
      |FROM p
      |GROUP BY doc_id, sample_rate, n_samples
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("peak", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = graft.media.MediaGen.wavBytes(id)
        val wav = graft.media.WavCodec.decode(bytes)
        var sq = 0L; var peak = 0L
        var i = 0
        while (i < wav.samples.length) {
          val v = wav.samples(i).toLong
          sq += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        org.apache.spark.sql.Row(id, wav.sampleRate, wav.samples.length,
          bytes.length.toLong, sq, peak)
      }
    }(enc)
      .select(
        col("doc_id"), col("sample_rate"), col("n_samples"),
        col("byte_len"),
        floor(col("n_samples") * lit(1000.0) / col("sample_rate"))
          .cast("bigint").as("duration_ms"),
        round(sqrt(col("sum_sq") * lit(1.0) / col("n_samples")), 4)
          .as("rms"),
        col("peak"))
      .orderBy(col("doc_id"))
  }

  /** Real PNG decode — the fourth real codec in the multimodal tier
    * (BMP, WAV, GIF, now PNG): the engine ENCODES each doc's
    * closed-form pixels into a genuine PNG (zlib-deflated scanlines,
    * CRC'd chunks, filter type cycling 0–4 by row so every image
    * exercises every standard filter) and then PARSES the bytes back —
    * chunk walk, CRC verify, multi-IDAT inflate, per-row unfiltering
    * with the Paeth predictor. The oracle recomputes the SAME channel
    * means from MediaGen's pixel formula over `range()`, so the whole
    * compressed byte layout sits under the hash gate. byte_len is NOT
    * emitted — deflate output size is not closed-form (that's the
    * point of a real compressor). */
  val qPngDecode: QDef = QDef(
    "q_png_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(5 + doc_id % 8 AS INT) AS width,
      |    CAST(5 + (doc_id // 2) % 7 AS INT) AS height
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, width, height,
      |    unnest(range(3 * width * height)) AS j
      |  FROM g),
      |p AS (
      |  SELECT doc_id, width, height, j,
      |    (doc_id * 17 + j * 3) % 256 AS val
      |  FROM v)
      |SELECT doc_id, width, height,
      |  ROUND(SUM(CASE WHEN j % 3 = 0 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_r,
      |  ROUND(SUM(CASE WHEN j % 3 = 1 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_g,
      |  ROUND(SUM(CASE WHEN j % 3 = 2 THEN val ELSE 0 END) * 1.0
      |    / (width * height), 4) AS mean_b
      |FROM p
      |GROUP BY doc_id, width, height
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val statsSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // encode THEN decode: both directions of the byte layout are
        // on the hash path
        val png = graft.media.PngCodec
          .decode(graft.media.MediaGen.pngBytes(id))
        val (sr, sg, sb) = channelSums(png.rgb)
        org.apache.spark.sql.Row(
          id, png.width, png.height, sr, sg, sb)
      }
    }(enc)
      .select(
        col("doc_id"), col("width"), col("height"),
        round(col("sum_r") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_r"),
        round(col("sum_g") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_g"),
        round(col("sum_b") * lit(1.0) / (col("width") * col("height")), 4)
          .as("mean_b"))
      .orderBy(col("doc_id"))
  }

  /** REAL multi-frame frame-sampling: encode deterministic animated
    * GIF89a payloads (real variable-width LZW — GifCodec), decode the
    * container back off the bytes, sample every SECOND frame, and
    * report per-frame palette-resolved channel means. This upgrades
    * the frame-sampling lane from the opaque-container stub
    * (qMultimodalFrames) to a genuine codec path: only sampled frames'
    * pixels are touched after the container walk, mirroring a
    * production keyframe-extraction job. The oracle recomputes the
    * SAME statistics from MediaGen's closed-form index + palette
    * formulas, so the whole byte layout — LZW bit packing, sub-block
    * framing, palette table — is under the hash gate. */
  val qGifFrames: QDef = QDef(
    "q_gif_frames",
    """WITH g AS (
      |  SELECT doc_id,
      |    8 + doc_id % 5 AS w,
      |    6 + (doc_id // 2) % 5 AS h,
      |    CAST(3 + doc_id % 4 AS INT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, w, h, n_frames,
      |    CAST(unnest(range(n_frames)) AS INT) AS frame_idx
      |  FROM g),
      |sampled AS (SELECT * FROM f WHERE frame_idx % 2 = 0),
      |px AS (
      |  SELECT doc_id, n_frames, frame_idx, w, h,
      |    unnest(range(w * h)) AS j
      |  FROM sampled),
      |c AS (
      |  SELECT doc_id, n_frames, frame_idx,
      |    (doc_id * 7 + frame_idx * 11 + j * 5) % 16 AS ci
      |  FROM px)
      |SELECT doc_id, n_frames, frame_idx,
      |  ROUND(AVG((ci * 17 + 3) % 256), 4) AS mean_r,
      |  ROUND(AVG((ci * 29 + 7) % 256), 4) AS mean_g,
      |  ROUND(AVG((ci * 43 + 11) % 256), 4) AS mean_b
      |FROM c
      |GROUP BY doc_id, n_frames, frame_idx
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("n_px", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val gif = graft.media.GifCodec.decode(
          graft.media.MediaGen.gifBytes(id))
        gif.frames.zipWithIndex
          .filter(_._2 % 2 == 0) // keyframe sampling: every 2nd frame
          .map { case (frame, fi) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < frame.length) {
              val (cr, cg, cb) = gif.palette(frame(i) & 0xff)
              sr += cr; sg += cg; sb += cb
              i += 1
            }
            org.apache.spark.sql.Row(
              id, gif.frames.length, fi, sr, sg, sb, frame.length.toLong)
          }
      }
    }(enc)
      .select(
        col("doc_id"), col("n_frames"), col("frame_idx"),
        round(col("sum_r") * lit(1.0) / col("n_px"), 4).as("mean_r"),
        round(col("sum_g") * lit(1.0) / col("n_px"), 4).as("mean_g"),
        round(col("sum_b") * lit(1.0) / col("n_px"), 4).as("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** APNG frame sampling — true-color animated decode through the real
    * PNG machinery (acTL/fcTL/fdAT container walk + per-frame zlib +
    * all five scanline filters), retiring the last stubbed frame lane:
    * where q_gif_frames samples PALETTE frames and qMultimodalFrames
    * fakes an opaque container, this decodes genuine RGB animation
    * frames, and ONLY the sampled (even-index) frames are ever
    * inflated — the container walk validates every chunk's CRC and
    * sequence number but skipped frames' zlib streams stay compressed,
    * which is the cost model of a production keyframe extractor. The
    * oracle recomputes per-frame channel means from MediaGen's
    * closed-form pixel formula, so the whole layout — chunk framing,
    * sequence numbering, per-frame deflate, filter cycling — sits
    * under the hash gate. */
  val qApngFrames: QDef = QDef(
    "q_apng_frames",
    """WITH g AS (
      |  SELECT doc_id,
      |    CAST(7 + doc_id % 6 AS INT) AS w,
      |    CAST(5 + (doc_id // 2) % 6 AS INT) AS h,
      |    CAST(2 + doc_id % 4 AS INT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, w, h, n_frames,
      |    CAST(unnest(range(n_frames)) AS INT) AS frame_idx
      |  FROM g),
      |sampled AS (SELECT * FROM f WHERE frame_idx % 2 = 0),
      |px AS (
      |  SELECT doc_id, n_frames, frame_idx, w, h,
      |    unnest(range(3 * w * h)) AS j
      |  FROM sampled),
      |v AS (
      |  SELECT doc_id, n_frames, frame_idx, w, h,
      |    j, (doc_id * 13 + frame_idx * 19 + j * 7) % 256 AS val
      |  FROM px)
      |SELECT doc_id, n_frames, frame_idx,
      |  ROUND(SUM(CASE WHEN j % 3 = 0 THEN val ELSE 0 END) * 1.0
      |    / (w * h), 4) AS mean_r,
      |  ROUND(SUM(CASE WHEN j % 3 = 1 THEN val ELSE 0 END) * 1.0
      |    / (w * h), 4) AS mean_g,
      |  ROUND(SUM(CASE WHEN j % 3 = 2 THEN val ELSE 0 END) * 1.0
      |    / (w * h), 4) AS mean_b
      |FROM v
      |GROUP BY doc_id, n_frames, frame_idx, w, h
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("n_px", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val (w, h, n, frames) = graft.media.ApngCodec.decodeSampled(
          graft.media.MediaGen.apngBytes(id), (idx, _) => idx % 2 == 0)
        frames.map { case (fi, rgb) =>
          val (sr, sg, sb) = channelSums(rgb)
          org.apache.spark.sql.Row(
            id, n, fi, sr, sg, sb, (w * h).toLong)
        }
      }
    }(enc)
      .select(
        col("doc_id"), col("n_frames"), col("frame_idx"),
        round(col("sum_r") * lit(1.0) / col("n_px"), 4).as("mean_r"),
        round(col("sum_g") * lit(1.0) / col("n_px"), 4).as("mean_g"),
        round(col("sum_b") * lit(1.0) / col("n_px"), 4).as("mean_b"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val defs: Seq[QDef] = Seq(
    qMultimodalMeta, qMultimodalFeatures, qMultimodalFrames,
    qImageDecode, qImageResize, qAudioStats, qGifFrames, qPngDecode,
    qApngFrames)
}
