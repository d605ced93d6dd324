package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for component-level timing experiments during the
  * optimization rounds: time(label){...} around noop() sinks of
  * pipeline prefixes, run via `runMain graft.tools.Scratch`. The
  * experiment bodies are throwaway — findings land in
  * OPTIMIZATION_rNN.md (r14 used this for the q_bootstrap_ci
  * conv-vs-md5 split, the q_weighted_median grain-aggregate floor,
  * the q_label_prop AQE on/off A/B, and the q_join_pit max_by
  * alternative), and the body is reset to this stub between
  * experiments so the committed tree never carries a stale one. */
object Scratch {
  def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableLoader.warm(spark, sfDir)
    // current experiment: (none — stub)
    time("warm tables only")(())
    spark.stop()
  }
}
