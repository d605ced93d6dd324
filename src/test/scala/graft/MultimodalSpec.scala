package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Binary-column plumbing: schema, deterministic stub decode, and the
  * partition-parallel feature-extraction pipeline (SURVEY.md §2.9
  * multimodal row — the codec itself is stubbed, the Spark shape is
  * real). */
class MultimodalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  test("decodeStub is deterministic and fixed-dimension") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.featureDim)
    assert(f1.forall(v => v >= 0f && v < 1f))
  }

  test("media table carries BinaryType payload + typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val schema = media.schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val row = media.orderBy(col("media_id")).limit(1).collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("byte_len") == payload.length.toLong)
  }

  test("extractFeatures runs partition-parallel and matches local stub") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).repartition(4)
    val feats = Multimodal.extractFeatures(media)
      .orderBy(col("media_id")).limit(3).collect()
    val texts = graft.sources.TableLoader.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes("UTF-8")).toMap
    feats.foreach { r =>
      val want = Multimodal.decodeStub(texts(r.getAs[Long]("media_id")))
      val got = r.getAs[scala.collection.Seq[Float]]("features").toSeq
      assert(got == want.toSeq)
    }
  }

  test("q_multimodal_features covers every document exactly once") {
    val out = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
    val n = graft.sources.TableLoader.documents(spark, sfDir).count()
    assert(out.count() == n)
    assert(out.where(col("f_sum") < 0 || col("f_sum") > 16).count() == 0)
  }

  test("resizeMedia shrinks payloads, updates byte_len, keeps schema") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).repartition(4)
    val target = 64
    val out = Multimodal.resizeMedia(media, target)
    // same names + types via the SQL rendering (nullability-free at
    // every nesting level: the declared mediaSchema is strict, derived
    // projections are relaxed)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(out.schema) == shape(media.schema))
    val rows = out.collect()
    assert(rows.length == media.count())
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(p.length <= target)
      assert(meta.getLong(0) == p.length.toLong)
    }
    // deterministic: same input → same bytes
    val a = out.orderBy(col("media_id")).limit(1)
      .collect()(0).getAs[Array[Byte]]("payload").toSeq
    val b = Multimodal.resizeMedia(media, target)
      .orderBy(col("media_id")).limit(1)
      .collect()(0).getAs[Array[Byte]]("payload").toSeq
    assert(a == b)
  }

  test("sampleFrames emits every stride-th frame with local-stub parity") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).repartition(4)
    val stride = 4
    val frames = Multimodal.sampleFrames(media, stride)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")) ->
        r.getAs[scala.collection.Seq[Float]]("features").toSeq)
      .toMap
    val texts = graft.sources.TableLoader.documents(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes("UTF-8")).toMap
    // exact expected count: sum over docs of ceil(nFrames/stride)
    val expectedCount = texts.values.map { b =>
      val nFrames = b.length / Multimodal.frameBytes
      (nFrames + stride - 1) / stride
    }.sum
    assert(frames.size == expectedCount)
    // spot-check one sampled frame against the local stub
    val (id, bytes) = texts.maxBy(_._2.length)
    val fb = Multimodal.frameBytes
    if (bytes.length >= fb) {
      val want = Multimodal.decodeStub(
        java.util.Arrays.copyOfRange(bytes, 0, fb)).toSeq
      assert(frames((id, 0)) == want)
    }
  }
}
