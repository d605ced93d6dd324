package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Stream-stream interval join semantics (StreamOps.intervalJoin):
  * in-window matches join, out-of-window rows don't, and the left-outer
  * variant emits the unmatched left row once the watermark proves no
  * match can still arrive.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("inner interval join matches only within the window") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    imps.addData(Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:00:00"))))
    clks.addData(Seq(
      (1L, ts("2026-01-01 10:10:00")),  // within 30 min → match
      (2L, ts("2026-01-01 11:30:00")))) // outside → no match
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("user_id", "imp_ts"),
      clks.toDF().toDF("user_id", "clk_ts"),
      key = "user_id", leftTs = "imp_ts", rightTs = "clk_ts",
      within = "30 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_inner").start()
    try q.processAllAvailable()
    finally q.stop()
    val rows = spark.table("ssj_inner")
      .select($"user_id").as[Long].collect().toSeq
    assert(rows == Seq(1L))
  }

  test("left outer emits unmatched row after watermark passes") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    imps.addData(Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:00:00"))))
    clks.addData(Seq(
      (1L, ts("2026-01-01 10:10:00")),
      (2L, ts("2026-01-01 11:30:00"))))
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("user_id", "imp_ts"),
      clks.toDF().toDF("user_id", "clk_ts"),
      key = "user_id", leftTs = "imp_ts", rightTs = "clk_ts",
      within = "30 minutes", joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_outer").start()
    try {
      q.processAllAvailable()
      // push both watermarks far past 10:30 + delay so the engine can
      // prove imp#2 will never match and emit its null-extended row
      imps.addData(Seq((9L, ts("2026-01-01 13:00:00"))))
      clks.addData(Seq((9L, ts("2026-01-01 13:00:00"))))
      q.processAllAvailable()
      // one more batch: outer results are emitted in the microbatch
      // AFTER the watermark advance is committed
      imps.addData(Seq((10L, ts("2026-01-01 14:00:00"))))
      clks.addData(Seq((10L, ts("2026-01-01 14:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj_outer")
      .select($"user_id", $"clk_ts".isNull.as("unmatched"))
      .as[(Long, Boolean)].collect().toSet
    assert(got.contains((1L, false)), s"matched row missing: $got")
    assert(got.contains((2L, true)), s"outer row for imp#2 missing: $got")
  }

  test("stream-static join enriches events with a broadcast dimension") {
    // the third streaming-join shape: per-microbatch hash join against
    // a static dim — no watermark, no state (the dim is re-planned
    // each batch; at scale it rides a broadcast, fact never shuffles)
    implicit val ctx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp)]
    events.addData(Seq(
      (0L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:01:00")),
      (7L, ts("2026-01-01 10:02:00")))) // nationkey 7 exists too
    val dim = graft.sources.TableLoader
      .nation(spark, "/root/testdata/sf0.001")
      .select($"n_nationkey".cast("long").as("key"), $"n_name")
    val joined = events.toDF().toDF("key", "ts")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("key"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_static").start()
    try q.processAllAvailable()
    finally q.stop()
    val names = spark.table("ss_static")
      .select($"key", $"n_name").as[(Long, String)].collect().toMap
    assert(names.keySet == Set(0L, 1L, 7L))
    val want = dim.as[(Long, String)].collect().toMap
    assert(names == want.view.filterKeys(names.keySet).toMap)
  }
}
