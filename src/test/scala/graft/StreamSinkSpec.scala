package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSinks

/** foreachBatch + Trigger.AvailableNow: the incremental stream→lake
  * pattern. Two separate drains over one checkpoint must produce each
  * input row exactly once across the batch-addressed output dirs. */
class StreamSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("AvailableNow drains incrementally, batch-addressed, no dups") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("sink_out").toString
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    val stream = MemoryStream[(Long, String)]

    stream.addData((1L, "a"), (2L, "b"))
    val q1 = StreamSinks.foreachBatchParquet(
      stream.toDF().toDF("id", "v"), out, ckpt)
    q1.awaitTermination()

    // second drain over the SAME checkpoint: only the new rows flow
    stream.addData((3L, "c"))
    val q2 = StreamSinks.foreachBatchParquet(
      stream.toDF().toDF("id", "v"), out, ckpt)
    q2.awaitTermination()

    val got = spark.read.option("basePath", out).parquet(out)
      .select($"id", $"v", $"batch")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got: ${got.toSeq}")
    // the second drain landed in a LATER batch dir than the first
    assert(got.last._3 > got.head._3)
  }

  test("streaming ingest dedups each micro-batch against the corpus") {
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("dsink_out").toString
    val ckpt = Files.createTempDirectory("dsink_ckpt").toString
    val corpusDoc = graft.sources.TableLoader.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(1)
      .collect()(0).getString(1)
    val novel = (1 to 60)
      .map(i => s"streamword$i fresh${i * 3} tok${i * 17}").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    stream.addData(
      (50001L, corpusDoc), // exact corpus dup — dropped
      (50002L, novel), // novel — kept
      (50003L, novel)) // in-batch exact dup — dropped
    val q = StreamSinks.foreachBatchDedupParquet(
      stream.toDF().toDF("doc_id", "text"), sfDir, out, ckpt)
    q.awaitTermination()
    val kept = spark.read.option("basePath", out).parquet(out)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(50002L), s"survivors: $kept")
  }

  test("incremental sketch state merges across drains and matches " +
    "exact counts (no-purge regime)") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val state = Files.createTempDirectory("sksink_state").toString
    val ckpt = Files.createTempDirectory("sksink_ckpt").toString
    val stream = MemoryStream[(String, Long)]

    // drain 1: users 0..99 on 'click', 0..49 on 'view'
    stream.addData((0L until 100L).map(u => ("click", u)) ++
      (0L until 50L).map(u => ("view", u)): _*)
    StreamSinks.foreachBatchSketchParquet(
      stream.toDF().toDF("event_type", "user_id"), state, ckpt)
      .awaitTermination()

    // drain 2: 50 NEW click users + user 7 hammered on view
    stream.addData((100L until 150L).map(u => ("click", u)) ++
      Seq.fill(40)(("view", 7L)): _*)
    StreamSinks.foreachBatchSketchParquet(
      stream.toDF().toDF("event_type", "user_id"), state, ckpt)
      .awaitTermination()

    val st = StreamSinks.latestSketchState(spark, state).get
    val rows = st
      .select(col("event_type"),
        hll_sketch_estimate(col("hll")).as("users"),
        graft.functions.FreqSketch
          .estimate(col("freq"), lit(7L)).getField("est").as("u7"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // HLL at these cardinalities is exact-ish; allow 2% slack
    assert(math.abs(rows("click")._1 - 150L) <= 3,
      s"click users ${rows("click")._1}")
    assert(math.abs(rows("view")._1 - 50L) <= 2,
      s"view users ${rows("view")._1}")
    // frequent-items in the exact regime: user 7 = 1 (drain 1) + 40
    assert(rows("view")._2 == 41L, s"view u7 ${rows("view")._2}")
    assert(rows("click")._2 == 1L, s"click u7 ${rows("click")._2}")
  }

  test("sketch state: uncommitted dirs are never merged as state, and " +
    "superseded dirs prune down to {latest, predecessor}") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val state = Files.createTempDirectory("skgate_state").toString
    val ckpt = Files.createTempDirectory("skgate_ckpt").toString
    val stream = MemoryStream[(String, Long)]
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a half-written directory from a "crashed" earlier run: parquet
    // data but NO _SUCCESS — must be invisible to merge AND read point
    val ghost = s"$state/upto_batch=9999"
    Seq(("click", 777L)).toDF("event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("hll"),
        graft.functions.FreqSketch.sketch(col("user_id"), 64).as("freq"))
      .write.parquet(ghost)
    fs.delete(new org.apache.hadoop.fs.Path(ghost, "_SUCCESS"), false)
    assert(StreamSinks.latestSketchState(spark, state).isEmpty,
      "read point saw a dir without _SUCCESS")

    // three drains; each merges only _SUCCESS-committed predecessors.
    // retainGenerations=1 = the floor (predecessor only): pins that
    // pruning can never go below the replay-required predecessor
    for (i <- 0 until 3) {
      stream.addData((0L until 10L).map(u => ("click", i * 100L + u)): _*)
      StreamSinks.foreachBatchSketchParquet(
        stream.toDF().toDF("event_type", "user_id"), state, ckpt,
        retainGenerations = 1)
        .awaitTermination()
    }
    // state reflects exactly the 30 streamed users — the ghost's user
    // 777 was never merged (it would be +1 on the exact-regime count)
    val st = StreamSinks.latestSketchState(spark, state).get
    val users = st.filter(col("event_type") === "click")
      .select(hll_sketch_estimate(col("hll"))).collect()(0).getLong(0)
    assert(math.abs(users - 30L) <= 1, s"click users $users")
    val u777 = st.filter(col("event_type") === "click")
      .select(graft.functions.FreqSketch
        .estimate(col("freq"), lit(777L)).getField("est"))
      .collect()(0).getLong(0)
    assert(u777 == 0L, "uncommitted ghost state leaked into the merge")

    // retention: of the three committed batch dirs only the latest two
    // remain (predecessor kept for uncommitted-batch replay); the
    // ghost is not a committed predecessor so pruning never considered
    // it (ids above the current batch are out of scope by the < id
    // filter) — it stays, still gated out of every read
    val committed = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$state/upto_batch=*"))
      .map(_.getPath.getName.stripPrefix("upto_batch=").toLong)
      .filter(_ != 9999L).sorted
    assert(committed.length == 2,
      s"expected latest+predecessor after pruning, got ${committed.toSeq}")

    // crashed-artifact pruning: an UNCOMMITTED dir and an orphaned
    // STAGING dir below the newest committed predecessor can never
    // become valid state (their batch will never replay) — the next
    // commit removes both. The high-id ghost (9999) stays: ids at or
    // above the current batch are out of pruning scope by design.
    val lowGhost = new org.apache.hadoop.fs.Path(s"$state/upto_batch=1")
    val lowStaging =
      new org.apache.hadoop.fs.Path(s"$state/.staging_upto_batch=1")
    fs.mkdirs(lowGhost) // no _SUCCESS: a crash between write and commit
    fs.mkdirs(lowStaging) // a crash mid-write, before the rename
    stream.addData(("click", 9000L))
    StreamSinks.foreachBatchSketchParquet(
      stream.toDF().toDF("event_type", "user_id"), state, ckpt,
      retainGenerations = 1)
      .awaitTermination()
    assert(!fs.exists(lowGhost), "uncommitted low-id dir must be pruned")
    assert(!fs.exists(lowStaging), "orphaned staging dir must be pruned")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/upto_batch=9999")),
      "future-id ghost stays out of pruning scope")
  }
}
