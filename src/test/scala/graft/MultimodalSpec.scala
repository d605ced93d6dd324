package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Binary-column pipeline over REAL codecs: container sniffing, the
  * mixed-kind media table, partition-parallel per-kind feature
  * extraction, real thumbnailing, and keyframe sampling (SURVEY.md
  * §2.9 multimodal row — both the codecs and the Spark shape are
  * real; the oracle gate covers the same lanes at the driver). */
class MultimodalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("sniffCodec dispatches on magic bytes and rejects unknowns") {
    import graft.media.MediaGen
    assert(Multimodal.sniffCodec(MediaGen.imageBytes(1L)) == "bmp")
    assert(Multimodal.sniffCodec(MediaGen.pngBytes(1L)) == "png")
    assert(Multimodal.sniffCodec(MediaGen.wavBytes(1L)) == "wav")
    assert(Multimodal.sniffCodec(MediaGen.apngBytes(1L)) == "apng")
    // r11 review: GIF89a was a fully supported codec the dispatch
    // never routed to
    assert(Multimodal.sniffCodec(MediaGen.gifBytes(1L)) == "gif")
    val e = intercept[IllegalArgumentException] {
      Multimodal.sniffCodec("no codec claims this".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("unknown container"), e.getMessage)
  }

  test("durations are DECODE-derived: fcTL/GCE delays, not an " +
    "assumed frame rate — and GIF payloads route through " +
    "extractFeatures (r11 review)") {
    import graft.media.{ApngCodec, GifCodec, MediaGen}
    import spark.implicits._
    // the fixture encoders write 100 ms (APNG 1/10 s) and 10 cs (GIF)
    // per frame — the decoders must READ those values back
    val apng = ApngCodec.decode(MediaGen.apngBytes(3L))
    assert(apng.delaysMs.toSeq == Seq.fill(apng.frames.length)(100L))
    val gif = GifCodec.decode(MediaGen.gifBytes(3L))
    assert(gif.delaysCs.toSeq == Seq.fill(gif.frames.length)(10))
    // the features path reports duration_ms = Σ decoded delays
    val twoFrame = ApngCodec.encode(4, 3,
      Array.fill(2)(Array.fill(36)(7)))
    val feats = Multimodal
      .extractFeatures(Seq((900L, twoFrame)).toDF("media_id", "payload"))
      .collect().head
    assert(feats.getAs[Long]("duration_ms") == 200L) // 2 × 100 ms
    // gif features: decode-derived dims, duration, channel sums
    val gfe = Multimodal
      .extractFeatures(
        Seq((901L, MediaGen.gifBytes(5L))).toDF("media_id", "payload"))
      .collect().head
    assert(gfe.getAs[String]("codec") == "gif")
    assert(gfe.getAs[Int]("width") == gif.width ||
      gfe.getAs[Int]("width") > 0)
    assert(gfe.getAs[Long]("duration_ms") ==
      GifCodec.decode(MediaGen.gifBytes(5L)).delaysCs.map(_ * 10L).sum)
  }

  test("sniffCodec terminates on a corrupt huge PNG chunk length " +
    "instead of overflowing the offset") {
    // PNG signature + one chunk whose declared length is large enough
    // that `off + 12 + len` overflows Int (0x7FFFFFF8): the walk must
    // end as "png" (the decoder rejects the stream downstream), not
    // throw ArrayIndexOutOfBoundsException on a negative index
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A)
    val chunk = Array[Byte](0x7F, 0xFF.toByte, 0xFF.toByte, 0xF8.toByte,
      'f', 'a', 'K', 'e') ++ new Array[Byte](16)
    assert(Multimodal.sniffCodec(sig ++ chunk) == "png")
  }

  test("media table carries BinaryType payload + metadata that " +
    "matches the real encoding") {
    val media = Multimodal.mediaTable(spark, sfDir)
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = media.orderBy(col("media_id")).limit(8).collect()
    rows.foreach { row =>
      val payload = row.getAs[Array[Byte]]("payload")
      val meta = row.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Long]("byte_len") == payload.length.toLong)
      val id = row.getAs[Long]("media_id")
      val expectKind = (id % 4) match {
        case 0 | 1 => "image"
        case 2 => "audio"
        case _ => "video"
      }
      assert(row.getAs[String]("kind") == expectKind)
    }
    // all four containers present in the first 8 ids
    assert(rows.map(r =>
      Multimodal.sniffCodec(r.getAs[Array[Byte]]("payload"))).toSet ==
      Set("bmp", "png", "wav", "apng"))
  }

  test("extractFeatures decodes per kind and matches the closed forms") {
    val media = Multimodal.mediaTable(spark, sfDir).repartition(4)
    val feats = Multimodal.extractFeatures(media)
      .orderBy(col("media_id")).limit(8).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    import graft.media.MediaGen
    feats.foreach { case (id, r) =>
      (id % 4) match {
        case 0 =>
          val (w, h) = MediaGen.imageDims(id)
          assert(r.getAs[String]("codec") == "bmp")
          assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
          assert(r.getAs[Long]("acc") ==
            MediaGen.imagePixels(id).map(_.toLong).sum)
        case 1 =>
          val (w, h) = MediaGen.pngDims(id)
          assert(r.getAs[String]("codec") == "png")
          assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
          assert(r.getAs[Long]("acc") ==
            MediaGen.pngPixels(id).map(_.toLong).sum)
        case 2 =>
          assert(r.getAs[String]("codec") == "wav")
          assert(r.isNullAt(r.fieldIndex("width")))
          val s = MediaGen.wavSamples(id)
          assert(r.getAs[Long]("acc") ==
            s.map(v => v.toLong * v.toLong).sum)
          assert(r.getAs[Long]("duration_ms") ==
            s.length * 1000L / MediaGen.wavRate(id))
        case _ =>
          val (w, h) = MediaGen.apngDims(id)
          assert(r.getAs[String]("codec") == "apng")
          assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
          assert(r.getAs[Long]("acc") ==
            MediaGen.apngFramePixels(id, 0).map(_.toLong).sum)
          assert(r.getAs[Long]("duration_ms") ==
            MediaGen.apngFrameCount(id) * 100L)
      }
    }
  }

  test("q_multimodal_features covers every document exactly once") {
    val out = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
    val n = graft.sources.TableLoader.documents(spark, sfDir).count()
    assert(out.count() == n)
    assert(out.where(col("f0") < 0).count() == 0)
    assert(out.select(col("codec")).distinct().count() == 4)
  }

  test("resizeMedia thumbnails per kind: 8x8 stills, decimated audio, " +
    "even-frame video, metadata updated") {
    val media = Multimodal.mediaTable(spark, sfDir).repartition(4)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    val out = Multimodal.resizeMedia(media)
    assert(shape(out.schema) == shape(media.schema))
    val rows = out.orderBy(col("media_id")).limit(8).collect()
    import graft.media.MediaGen
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val p = r.getAs[Array[Byte]]("payload")
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getLong(0) == p.length.toLong)
      (id % 4) match {
        case 0 =>
          val (w, h, rgb) = graft.media.BmpCodec.decode(p)
          assert(w == 8 && h == 8 && rgb.length == 192)
          assert(meta.getAs[Int]("width") == 8)
        case 1 =>
          val png = graft.media.PngCodec.decode(p)
          assert(png.width == 8 && png.height == 8)
        case 2 =>
          val wav = graft.media.WavCodec.decode(p)
          val n0 = MediaGen.wavSamples(id).length
          assert(wav.samples.length == (n0 + 1) / 2)
          // decimation keeps every 2nd sample, rate unchanged
          assert(wav.samples(1) == MediaGen.wavSamples(id)(2))
        case _ =>
          val apng = graft.media.ApngCodec.decode(p)
          val n0 = MediaGen.apngFrameCount(id)
          assert(apng.frames.length == (n0 + 1) / 2)
          assert(meta.getAs[Long]("duration_ms") ==
            apng.frames.length * 100L)
      }
    }
    // deterministic: same input → same bytes
    val a = out.orderBy(col("media_id")).limit(1)
      .collect()(0).getAs[Array[Byte]]("payload").toSeq
    val b = Multimodal.resizeMedia(media)
      .orderBy(col("media_id")).limit(1)
      .collect()(0).getAs[Array[Byte]]("payload").toSeq
    assert(a == b)
  }

  test("sampleFrames: stills one frame, audio none, video every " +
    "stride-th frame only") {
    val media = Multimodal.mediaTable(spark, sfDir).repartition(4)
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    import graft.media.MediaGen
    val ids = graft.sources.TableLoader.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      (id % 4) match {
        case 0 | 1 =>
          assert(byId(id).length == 1 &&
            byId(id)(0).getAs[Int]("frame_idx") == 0)
        case 2 =>
          assert(!byId.contains(id), s"audio $id must emit no frames")
        case _ =>
          val n = MediaGen.apngFrameCount(id)
          val got = byId(id).map(_.getAs[Int]("frame_idx")).sorted.toSeq
          assert(got == (0 until n by 2).toSeq, s"video $id frames $got")
          // sampled frame sums match the per-frame closed form
          byId(id).foreach { fr =>
            val fi = fr.getAs[Int]("frame_idx")
            assert(fr.getAs[Long]("acc") ==
              MediaGen.apngFramePixels(id, fi).map(_.toLong).sum)
          }
      }
    }
  }
}
