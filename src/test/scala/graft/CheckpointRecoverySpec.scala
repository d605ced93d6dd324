package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming operational semantics: a file-source pipeline with a
  * checkpoint must resume after a stop/restart, process only the files
  * that arrived while it was down, and never duplicate output rows —
  * the exactly-once file pipeline contract a production lake tail
  * depends on (SURVEY.md §3.4: offsets/commits journal to the
  * checkpoint location). */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("file stream resumes from checkpoint without duplicates") {
    val src = Files.createTempDirectory("graft_ckpt_src").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_meta").toString
    val schema = "id LONG, v STRING"

    def startQuery() = spark.readStream
      .schema(schema).json(src)
      .withColumn("tagged", concat(lit("row-"), $"id"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    def writeBatch(ids: Range, name: String): Unit =
      Files.writeString(
        java.nio.file.Paths.get(src, name),
        ids.map(i => s"""{"id": $i, "v": "x$i"}""").mkString("\n"))

    writeBatch(0 until 10, "a.json")
    val q1 = startQuery()
    try q1.processAllAvailable()
    finally q1.stop()

    // files arriving while the query is DOWN
    writeBatch(10 until 25, "b.json")
    val q2 = startQuery()
    try q2.processAllAvailable()
    finally q2.stop()

    val result = spark.read.parquet(out)
    assert(result.count() == 25, "each input row exactly once")
    assert(result.select("id").distinct().count() == 25,
      "no duplicated ids after recovery")
    assert(result.filter($"tagged" === "row-24").count() == 1,
      "post-restart rows processed")
  }
}
