package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.LakeOps
import graft.sources.TableLoader

/** Lake maintenance semantics: compaction preserves data exactly while
  * shrinking file count; dynamic partition overwrite replaces only the
  * written partitions. */
class LakeOpsSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.session

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("t").toString

  test("compact shrinks file count and preserves rows exactly") {
    val dir = tmp("graft_compact")
    val docs = TableLoader.documents(spark, sfDir)
    docs.repartition(64).write.parquet(dir) // fragmented: 64 tiny files
    val before = docs.orderBy("doc_id").collect().toSeq
    val report = LakeOps.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(report.filesBefore == 64)
    assert(report.filesAfter == 1)
    val after = spark.read.parquet(dir).orderBy("doc_id").collect().toSeq
    assert(after == before)
  }

  test("dynamic partition overwrite touches only written partitions") {
    val dir = tmp("graft_dynpart")
    val docs = TableLoader.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    LakeOps.writePartitioned(docs, dir, Seq("lang"))
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(langs.size > 1, "fixture must have several lang partitions")
    val target = langs.head
    val replacement = docs.filter(col("lang") === target)
      .withColumn("text", lit("REWRITTEN"))
    LakeOps.writePartitioned(replacement, dir, Seq("lang"))
    val back = spark.read.parquet(dir)
    // replaced partition carries the new text ...
    assert(back.filter(col("lang") === target)
      .filter(col("text") =!= "REWRITTEN").isEmpty)
    // ... every other partition is byte-for-byte the original
    val untouched = back.filter(col("lang") =!= target)
      .orderBy("doc_id").collect().toSeq
    val expected = docs.filter(col("lang") =!= target)
      .select(col("doc_id"), col("text"), col("lang"))
      .orderBy("doc_id").collect().toSeq
    assert(untouched == expected)
  }
}
