package graft

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch

/** Frequent-items sketch: the exact (no-purge) regime is under the
  * oracle hash via q_freq_sketch_topk; this spec pins what the oracle
  * can't — the merge path across partitions and the PURGE regime's
  * guarantees on seeded skewed data. */
class FreqSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("exact regime: estimates equal true counts and lb = est = ub") {
    val rows = SparkEntry.queries("q_freq_sketch_topk")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val truth = graft.sources.TableLoader.events(spark, sfDir)
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, est, lb, ub) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est == truth(id), s"user $id: est $est != ${truth(id)}")
      assert(lb == est && ub == est, "purge occurred in exact regime")
    }
  }

  test("distributed merge equals a single-threaded sketch (exact regime)") {
    import spark.implicits._
    val data = (1L to 2000L).map(i => i % 97) // 97 distinct keys
    val blob = data.toDF("k").repartition(13)
      .agg(FreqSketch.sketch($"k", 256).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val sk = LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(blob))
    val ref = new LongsSketch(256)
    data.foreach(ref.update)
    (0L until 97L).foreach { k =>
      assert(sk.getEstimate(k) == ref.getEstimate(k), s"key $k")
    }
  }

  test("purge regime: heavy hitters survive with valid bounds under " +
    "NO_FALSE_NEGATIVES; error within 3.5N/mapSize") {
    import spark.implicits._
    // 4 heavy keys (1000 each) in a sea of 2000 singletons; map of 32
    // slots cannot hold 2004 keys -> purges are forced
    val heavy = (0L until 4L).flatMap(k => Seq.fill(1000)(900000L + k))
    val tail = (1L to 2000L)
    val data = (heavy ++ tail).toDF("k").repartition(7)
    val blob = data.agg(FreqSketch.sketch($"k", 32).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val sk = LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(blob))
    val n = heavy.length + tail.length
    assert(sk.getStreamLength == n)
    assert(sk.getMaximumError <= 3.5 * n / 32 + 1)
    val found = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    (900000L until 900004L).foreach { k =>
      assert(found.contains(k), s"true heavy hitter $k dropped")
      assert(sk.getLowerBound(k) <= 1000L && 1000L <= sk.getUpperBound(k),
        s"bounds exclude truth for $k")
    }
  }

  test("blob re-merge is lossless: per-group blobs unioned == direct " +
    "global sketch (exact regime)") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i % 5, i % 113)).toDF("g", "k")
    val viaMerge = df.groupBy($"g")
      .agg(FreqSketch.sketch($"k", 512).as("sk"))
      .agg(FreqSketch.merge($"sk", 512).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = df.agg(FreqSketch.sketch($"k", 512).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val a = LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(viaMerge))
    val b = LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(direct))
    (0L until 113L).foreach { k =>
      assert(a.getEstimate(k) == b.getEstimate(k), s"key $k")
    }
  }

  test("freq_merge adopts the widest input map: wide blobs re-merged " +
    "through a narrow (default-64) merge stay exact, not purged") {
    import spark.implicits._
    // 300 distinct keys: exact at mapSize 512 (no purge), but far over
    // a 64-slot map's 48-key purge threshold — folding these blobs
    // into a fixed 64-slot merge buffer would purge and widen bounds
    val df = (1L to 9000L).map(i => (i % 5, i % 300)).toDF("g", "k")
    val merged = df.groupBy($"g")
      .agg(FreqSketch.sketch($"k", 512).as("sk"))
      .agg(FreqSketch.merge($"sk").as("sk")) // default maxMapSize = 64
      .collect()(0).getAs[Array[Byte]](0)
    val sk = LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(merged))
    assert(sk.getStreamLength == 9000L)
    // exactness survived the narrow merge: every count right, zero
    // error offset (purge would have made lb < ub somewhere)
    assert(sk.getMaximumError == 0,
      s"merge purged despite wide inputs (maxError=${sk.getMaximumError})")
    (0L until 300L).foreach { k =>
      assert(sk.getEstimate(k) == 30L, s"key $k")
    }
  }
}
