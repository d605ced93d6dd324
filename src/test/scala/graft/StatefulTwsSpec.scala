package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulOps, StreamOps}

/** `transformWithState` (Spark 4's successor to flatMapGroupsWithState)
  * and the RocksDB state store provider (SURVEY §4.3's large-keyspace
  * configuration).
  *
  * Covers: (1) the tws running-total twin agrees with the legacy
  * flatMapGroupsWithState operator on the same micro-batch replay, with
  * state carried across batches; (2) a windowed stateful aggregation
  * produces identical results under the default HDFS-backed provider
  * and under RocksDB.
  */
class StatefulTwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    StatefulOps.Ev(1, ts("2024-03-01 00:00:00"), 7, 1.5),
    StatefulOps.Ev(3, ts("2024-03-01 00:02:00"), 9, 4.0))
  private val batch2 = Seq(
    StatefulOps.Ev(2, ts("2024-03-01 00:01:00"), 7, 2.0),
    StatefulOps.Ev(4, ts("2024-03-01 00:03:00"), 9, 0.5))

  test("transformWithState running totals match flatMapGroupsWithState") {
    val restore = StreamOps.configureRocksDBStateStore(spark)
    try {
      implicit val ctx = spark.sqlContext
      val streamTws = MemoryStream[StatefulOps.Ev]
      val q = StatefulOps.runningTotalsTws(streamTws.toDS())
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_out").start()
      try {
        streamTws.addData(batch1)
        q.processAllAvailable()
        streamTws.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_out").orderBy($"user_id", $"event_id")
        .as[StatefulOps.Running].collect().toSeq
      // state carried across micro-batches per key:
      //   user 7: 1.5 then 1.5+2.0; user 9: 4.0 then 4.0+0.5
      assert(got == Seq(
        StatefulOps.Running(7, 1, 1.5), StatefulOps.Running(7, 2, 3.5),
        StatefulOps.Running(9, 3, 4.0), StatefulOps.Running(9, 4, 4.5)))

      // and the legacy API on the same replay agrees row-for-row
      val streamLegacy = MemoryStream[StatefulOps.Ev]
      val q2 = StatefulOps.runningTotals(streamLegacy.toDS())
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("legacy_out").start()
      try {
        streamLegacy.addData(batch1)
        q2.processAllAvailable()
        streamLegacy.addData(batch2)
        q2.processAllAvailable()
      } finally q2.stop()
      val legacy = spark.table("legacy_out")
        .orderBy($"user_id", $"event_id")
        .as[StatefulOps.Running].collect().toSeq
      assert(got == legacy)
    } finally restore()
  }

  test("windowed aggregation matches under HDFS-backed and RocksDB " +
    "state stores") {
    def run(name: String): Seq[org.apache.spark.sql.Row] = {
      implicit val ctx = spark.sqlContext
      val stream = MemoryStream[(Timestamp, String, Double)]
      val q = StreamOps
        .tumblingCounts(stream.toDF().toDF("ts", "event_type", "value"))
        .writeStream.outputMode(OutputMode.Complete)
        .format("memory").queryName(name).start()
      try {
        stream.addData(
          (ts("2024-03-01 00:10:00"), "click", 1.0),
          (ts("2024-03-01 00:40:00"), "click", 2.5),
          (ts("2024-03-01 01:10:00"), "view", 4.0))
        q.processAllAvailable()
        stream.addData((ts("2024-03-01 00:55:00"), "click", 3.0))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).orderBy($"w", $"event_type").collect().toSeq
    }
    val hdfs = run("win_hdfs")
    val restore = StreamOps.configureRocksDBStateStore(spark)
    val rocks = try run("win_rocks") finally restore()
    assert(hdfs == rocks)
    assert(hdfs.nonEmpty)
  }
}
