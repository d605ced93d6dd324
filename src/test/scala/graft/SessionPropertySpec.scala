package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the hardest frozen semantic (SURVEY.md §5.3, §7
  * risk 3): the gaps-and-islands rewrite used as the DuckDB oracle for
  * q_stream_session must agree with Spark's native session_window on
  * ADVERSARIAL event sets — including gaps of exactly the session
  * duration, duplicate timestamps, and single-event sessions.
  *
  * The islands rewrite is mirrored here in Spark (lag → break flag →
  * running sum → group), structurally identical to the oracle SQL, and
  * compared row-for-row against session_window over 30 random event
  * sets from a fixed seed.
  */
class SessionPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  private val gapSec = 1800L

  test("session_window == gaps-and-islands on random boundary-heavy data") {
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 30) {
      val base = 1700000000L
      var t = base
      // steps biased to land exactly on the gap boundary often, plus
      // ties (0) and near-boundary values
      val rows = (1 to 60).map { i =>
        val step = rng.nextInt(6) match {
          case 0 => 0L // duplicate ts
          case 1 => gapSec // EXACTLY the gap (must merge)
          case 2 => gapSec + 1 // just over (must break)
          case 3 => gapSec - 1 // just under (must merge)
          case 4 => rng.nextInt(120).toLong
          case _ => gapSec + rng.nextInt(1200).toLong
        }
        t += step
        (new Timestamp(t * 1000L), (i % 3).toLong)
      }
      val df = rows.toDF("ts", "user_id")

      val native = df
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select(
          $"user_id",
          $"session_window.start".as("s"),
          $"session_window.end".as("e"),
          $"n")
        .orderBy($"user_id", $"s")
        .collect().toSeq

      val w = Window.partitionBy($"user_id").orderBy($"ts")
      val islands = df
        .withColumn(
          "brk",
          when(
            unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)
              > gapSec * 1000000L,
            1).otherwise(0))
        .withColumn(
          "sid",
          sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sid")
        .agg(
          min($"ts").as("s"),
          (max(unix_micros($"ts")) + gapSec * 1000000L).as("e_us"),
          count(lit(1)).as("n"))
        .select(
          $"user_id", $"s", timestamp_micros($"e_us").as("e"), $"n")
        .orderBy($"user_id", $"s")
        .collect().toSeq

      assert(native == islands, s"trial $trial diverged")
    }
  }
}
