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
  * struct riding alongside. The Spark-side plumbing — schema,
  * partition-parallel batch decode shape, feature-vector output — is
  * real and tested; the actual codec call is STUBBED with a
  * deterministic fake (this container has no image/audio libraries):
  * `decodeStub` derives a fixed-size feature vector from the bytes.
  * Swapping in a real decoder changes ONE function, not the pipeline.
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

  val defs: Seq[QDef] = Seq(
    qMultimodalMeta, qMultimodalFeatures, qMultimodalFrames)
}
